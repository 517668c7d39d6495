"""At-rest encryption (lmcry analog) — encrypt → logdec round-trip,
wrong-key failure, key sourcing, encinfo format parity, and the
sign-then-encrypt layering with the sigprov hash chain.

ref: runtime/lmcry_gcry.c + libgcry.c (.encinfo IV/END block format,
zero padding), libcry_common.c key sourcing, tools/rscryutil.c
(decrypt tool), tests/queue-encryption-disk_keyfile.sh (keyfile =
raw 16 bytes; ciphertext must not contain plaintext), and
tests/queue-encryption-disk_keyprog-invalid-len.sh (bad key length
is a hard error carrying the required length).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from rsyslog_spark.streaming.cryprov import (
    ENCINFO_SUFFIX, FILETYPE_NAME, CryProvider, provider_from_params,
    read_encinfo)

KEY16 = b"1234567890123456"   # the reference golden's keyfile content


def _write(path, data: bytes):
    with open(path, "wb") as fh:
        fh.write(data)


class TestProviderPrimitives:
    def test_roundtrip_in_place(self, tmp_path):
        f = str(tmp_path / "app.log")
        plain = b"\n".join(b"msgnum:%08d" % i for i in range(100)) + b"\n"
        _write(f, plain)
        prov = CryProvider(key=KEY16)
        ei = prov.encrypt_file(f)
        ct = open(f, "rb").read()
        assert b"msgnum:00000000" not in ct       # check_not_present
        assert len(ct) % 16 == 0                  # zero-padded blocks
        assert ei == f + ENCINFO_SUFFIX
        assert prov.decrypt_file(f) == plain

    def test_encinfo_format(self, tmp_path):
        f = str(tmp_path / "x.log")
        _write(f, b"hello world\n")
        CryProvider(key=KEY16).encrypt_file(f, iv=bytes(16))
        lines = open(f + ENCINFO_SUFFIX).read().splitlines()
        # exact reference record shapes (libgcry.c eiWriteRec)
        assert lines[0] == f"FILETYPE:{FILETYPE_NAME}"
        assert lines[1] == "IV:" + "00" * 16
        assert lines[2] == "END:16"               # 12 bytes → 1 block

    def test_multi_block_append(self, tmp_path):
        """A closed-and-reopened file appends a second IV/END pair
        (new block, fresh IV) — decrypt walks both blocks."""
        f = str(tmp_path / "x.log")
        prov = CryProvider(key=KEY16)
        _write(f, b"first open\n")
        prov.encrypt_file(f, iv=b"A" * 16)
        blk1 = open(f, "rb").read()
        # simulate reopen+append: encrypt the new chunk, append bytes,
        # append the records with the cumulative END offset
        chunk2 = prov._pad(b"second open\n")
        from rsyslog_spark.streaming.cryprov import _cipher
        enc = _cipher(prov.key, b"B" * 16, "CBC").encryptor()
        ct2 = enc.update(chunk2) + enc.finalize()
        with open(f, "ab") as fh:
            fh.write(ct2)
        with open(f + ENCINFO_SUFFIX, "a") as fh:
            fh.write(f"IV:{(b'B' * 16).hex()}\n")
            fh.write(f"END:{len(blk1) + len(ct2)}\n")
        assert read_encinfo(f + ENCINFO_SUFFIX) == [
            (b"A" * 16, len(blk1)), (b"B" * 16, len(blk1) + len(ct2))]
        assert prov.decrypt_file(f) == b"first open\nsecond open\n"

    def test_wrong_key_fails(self, tmp_path):
        f = str(tmp_path / "x.log")
        plain = b"secret line one\nsecret line two\n"
        _write(f, plain)
        CryProvider(key=KEY16).encrypt_file(f)
        got = CryProvider(key=b"0000000000000000").decrypt_file(f)
        assert got != plain
        assert b"secret" not in got

    def test_invalid_key_length_names_required(self):
        with pytest.raises(ValueError, match="required: 16"):
            CryProvider(key=b"short", algo="AES128")
        with pytest.raises(ValueError, match="required: 32"):
            CryProvider(key=KEY16, algo="AES256")

    def test_keyfile_and_keyprogram(self, tmp_path):
        kf = str(tmp_path / "keyfile")
        _write(kf, KEY16)
        assert CryProvider(keyfile=kf).key == KEY16
        prog = f"printf %s {KEY16.decode()}"
        assert CryProvider(keyprogram=prog).key == KEY16
        _write(kf, b"")
        with pytest.raises(ValueError, match="empty"):
            CryProvider(keyfile=kf)

    def test_bad_encinfo_rejected(self, tmp_path):
        ei = str(tmp_path / "x.log.encinfo")
        _write(ei, b"FILETYPE:not-rsyslog\nIV:00\nEND:0\n")
        with pytest.raises(ValueError, match="not a rsyslog"):
            read_encinfo(ei)

    def test_ctr_and_aes256(self, tmp_path):
        f = str(tmp_path / "x.log")
        plain = b"ctr mode line\n"
        _write(f, plain)
        prov = CryProvider(key=KEY16 * 2, algo="AES256", mode="CTR")
        prov.encrypt_file(f)
        assert prov.decrypt_file(f) == plain


class TestConfigAndLogdec:
    CONF = """
ruleset(name="r") {{
  action(type="omfile" file="{out}"
         template="RSYSLOG_TraditionalFileFormat"
         cry.provider="gcry" cry.keyfile="{kf}"{extra})
}}
input(type="imfile" file="{inp}/*" ruleset="r")
"""

    def _run(self, spark, tmp_path, extra=""):
        inp = tmp_path / "in"
        inp.mkdir()
        (inp / "a.log").write_text(
            "<13>Aug 14 12:00:00 h1 app: msgnum:00000000\n"
            "<13>Aug 14 12:00:01 h2 app: msgnum:00000001\n")
        kf = tmp_path / "keyfile"
        kf.write_bytes(KEY16)
        out = tmp_path / "out"
        from rsyslog_spark.config.runtime import run_config_batch
        run_config_batch(spark, self.CONF.format(
            out=out, inp=inp, kf=kf, extra=extra))
        return str(out), str(kf)

    def test_config_encrypts_parts(self, spark, tmp_path):
        out, kf = self._run(spark, tmp_path)
        parts = [f for f in os.listdir(out) if f.startswith("part")
                 and not f.endswith(ENCINFO_SUFFIX)]
        assert parts
        joined = b"".join(
            open(os.path.join(out, p), "rb").read() for p in parts)
        assert b"msgnum:" not in joined           # no plaintext leak
        for p in parts:
            assert os.path.exists(os.path.join(out, p) + ENCINFO_SUFFIX)
        # logdec CLI round-trip (rscryutil role)
        res = subprocess.run(
            [sys.executable, "tools/logdec.py", "--keyfile", kf, out],
            capture_output=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        assert res.returncode == 0, res.stderr
        text = res.stdout.decode()
        assert "msgnum:00000000" in text and "msgnum:00000001" in text
        assert "h1" in text and "app:" in text    # rendered template

    def test_wrong_key_logdec_garbage(self, spark, tmp_path):
        out, _ = self._run(spark, tmp_path)
        badkf = tmp_path / "bad"
        badkf.write_bytes(b"0000000000000000")
        res = subprocess.run(
            [sys.executable, "tools/logdec.py",
             "--keyfile", str(badkf), out],
            capture_output=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        assert b"msgnum:" not in res.stdout

    def test_sign_then_encrypt_layering(self, spark, tmp_path):
        """sigprov chains the PLAINTEXT records; verification passes
        after logdec --write restores the files."""
        out, kf = self._run(
            spark, tmp_path, extra=' sig.provider="hashchain"')
        from rsyslog_spark.streaming.sigprov import verify_directory
        ok, _ = verify_directory(out)
        assert not ok                 # ciphertext fails the chain
        res = subprocess.run(
            [sys.executable, "tools/logdec.py", "--keyfile", kf,
             "--write", out],
            capture_output=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        assert res.returncode == 0, res.stderr
        ok, details = verify_directory(out)
        assert ok, details

    def test_unknown_provider_rejected(self, spark, tmp_path):
        from rsyslog_spark.config.runtime import run_config_batch
        inp = tmp_path / "in"
        inp.mkdir()
        (inp / "a.log").write_text("<13>Aug 14 12:00:00 h t: m\n")
        conf = f'''
ruleset(name="r") {{
  action(type="omfile" file="{tmp_path}/out"
         template="RSYSLOG_TraditionalFileFormat"
         cry.provider="nope" cry.key="1234567890123456")
}}
input(type="imfile" file="{inp}/*" ruleset="r")
'''
        with pytest.raises(ValueError, match="unknown cry.provider"):
            run_config_batch(spark, conf)

    def test_params_helper(self):
        p = provider_from_params({"cry.key": "1234567890123456",
                                  "cry.algo": "aes128",
                                  "cry.mode": "cbc"})
        assert p.algo == "AES128" and p.mode == "CBC"
