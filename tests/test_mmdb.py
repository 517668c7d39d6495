"""mmdblookup with REAL MaxMind-DB files (ref: plugins/mmdblookup/
mmdblookup.c; file format implemented from the public MaxMind-DB
spec in operators/mmdb.py). Goldens: mmdb.sh, mmdb-space.sh,
mmdb-multilevel.sh, mmdb-compound.sh, mmdb-open-missing.sh,
mmdb-lookup-wrong-ip-type.sh — binary fixtures read from the
reference tree (read-only test data)."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference/tests"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(f"{REF}/test.mmdb"),
    reason="reference mmdb fixtures unavailable")


class TestMMDBReader:
    def test_metadata_and_lookup(self):
        from rsyslog_spark.operators.mmdb import MMDBReader
        r = MMDBReader(f"{REF}/test.mmdb")
        assert r.metadata["ip_version"] == 4
        assert r.lookup_v4("202.106.0.20") == {"city": "Beijing"}
        assert r.lookup_v4("10.0.0.1") is None
        assert r.lookup_v4("not-an-ip") is None

    def test_geoip_city_deep(self):
        from rsyslog_spark.operators.mmdb import MMDBReader
        g = MMDBReader(f"{REF}/GeoIP2-City-Test.mmdb")
        rec = g.lookup_v4("81.2.69.160")
        assert rec["city"]["names"]["en"] == "London"
        assert rec["continent"]["code"] == "EU"
        assert rec["location"]["latitude"] == 51.5142
        assert rec["location"]["accuracy_radius"] == 100

    def test_range_export(self):
        from rsyslog_spark.operators.mmdb import MMDBReader
        r = MMDBReader(f"{REF}/test.mmdb")
        ranges = list(r.iter_v4_ranges())
        assert any(lo <= 3395944468 <= hi for lo, hi, _ in ranges)


class TestMMDBConfig:
    def _run(self, spark, tmp_path, mmdbfile, fields, ip):
        from rsyslog_spark.config.runtime import run_config_batch
        src = tmp_path / "in"
        src.mkdir(exist_ok=True)
        (src / "a.log").write_text(
            f"<13>Mar  1 10:00:00 h t: {ip} x\n")
        (tmp_path / "mmdb.rb").write_text(
            "version=2\nrule=: %ip:word% %remaining:word%\n")
        out = tmp_path / "out"
        conf = f'''
global(parser.removeMsgFirstSpace="off")
template(name="outfmt" type="string" string="%$!iplocation%\\n")
ruleset(name="testing") {{
  action(type="mmnormalize" rulebase="{tmp_path}/mmdb.rb")
  action(type="mmdblookup" mmdbfile="{mmdbfile}" key="$!ip"
         fields={fields})
  action(type="omfile" file="{out}" template="outfmt")
}}
input(type="imfile" file="{src}/*.log" ruleset="testing")
'''
        run_config_batch(spark, conf)
        return [ln for f in sorted(os.listdir(out))
                if f.startswith("part")
                for ln in open(out / f).read().splitlines()]

    def test_mmdb_basic(self, spark, tmp_path):
        # mmdb.sh / mmdb-container.sh byte-exact content check
        got = self._run(spark, tmp_path, f"{REF}/test.mmdb",
                        '"city"', "202.106.0.20")
        assert got == ['{ "city": "Beijing" }']

    def test_mmdb_space_value(self, spark, tmp_path):
        # mmdb-space.sh: value with a space survives
        got = self._run(spark, tmp_path, f"{REF}/with_space.mmdb",
                        '"city"', "202.106.0.20")
        assert got == ['{ "city": "Bei ing" }']

    def test_mmdb_multilevel(self, spark, tmp_path):
        # mmdb-multilevel.sh content checks: deep paths, numeric
        # leaves unquoted
        got = self._run(
            spark, tmp_path, f"{REF}/GeoIP2-City-Test.mmdb",
            '["!continent!code","!city!names!en","!location!latitude",'
            '"!location!longitude","!location!accuracy_radius"]',
            "81.2.69.160")
        line = got[0]
        for chk in ('"code": "EU"', '"en": "London"',
                    '"latitude": 51.5142', '"accuracy_radius": 100'):
            assert chk in line, line

    def test_mmdb_compound(self, spark, tmp_path):
        # mmdb-compound.sh: whole-subtree fields
        got = self._run(
            spark, tmp_path, f"{REF}/GeoIP2-City-Test.mmdb",
            '["!location","!subdivisions"]', "81.2.69.160")
        line = got[0]
        for chk in ('"accuracy_radius": 100', '"latitude": 51.5142',
                    '"time_zone": "Europe\\/London"',
                    '"iso_code": "ENG"'):
            assert chk in line, line

    def test_mmdb_open_missing(self, spark, tmp_path, capsys):
        # mmdb-open-missing.sh: error logged, engine keeps running
        got = self._run(spark, tmp_path,
                        f"{tmp_path}/does-not-exist.mmdb",
                        '"city"', "202.106.0.20")
        assert got == [""]        # no container, message survives
        assert "maxminddb error: cannot open database file" in \
            capsys.readouterr().err

    def test_mmdb_wrong_ip_type(self, spark, tmp_path):
        # mmdb-lookup-wrong-ip-type.sh: non-IP key -> no enrichment,
        # no crash
        got = self._run(spark, tmp_path, f"{REF}/test.mmdb",
                        '"city"', "not.an.ip.addr")
        assert got == [""]
