"""omfile signature provider: hash-chain manifests + verifier
(ref: runtime/sigprov.h interface, lmsig_ksi-ls12.c block signing,
tools/logsigner.c; omfile.c:133-140 per-action binding)."""

import json
import subprocess
import sys

from rsyslog_spark.streaming.sigprov import (
    HashChainSigner, chain_records, sign_file, verify_directory,
    verify_file,
)


def test_chain_shape_and_blocks():
    recs = [f"rec{i}".encode() for i in range(25)]
    m = chain_records(recs, block_size=10)
    assert m["records"] == 25
    assert len(m["block_hashes"]) == 2          # at 10 and 20
    # chain is order-sensitive: any reorder changes the final hash
    m2 = chain_records(list(reversed(recs)), block_size=10)
    assert m2["chain"] != m["chain"]
    # and prefix-sensitive: block hashes pin intermediate state
    m3 = chain_records(recs[:10], block_size=10)
    assert m3["chain"] == m["block_hashes"][0]


def test_sign_verify_tamper(tmp_path):
    f = tmp_path / "out.log"
    f.write_bytes(b"\n".join(f"line {i}".encode() for i in range(50))
                  + b"\n")
    sig = sign_file(str(f), block_size=8)
    ok, detail = verify_file(str(f))
    assert ok, detail
    manifest = json.loads(open(sig).read())
    assert manifest["records"] == 50

    # tamper ONE byte mid-file → verification fails and localizes
    data = bytearray(f.read_bytes())
    data[100] ^= 0x01
    f.write_bytes(bytes(data))
    ok, detail = verify_file(str(f))
    assert not ok and "block" in detail

    # dropping a record is also caught (count check)
    lines = f.read_bytes().split(b"\n")
    f.write_bytes(b"\n".join(lines[:10] + lines[11:]))
    ok, detail = verify_file(str(f))
    assert not ok


def test_record_at_a_time_signer_matches_batch(tmp_path):
    f = tmp_path / "s.log"
    recs = [f"r{i}".encode() for i in range(7)]
    f.write_bytes(b"\n".join(recs) + b"\n")
    s = HashChainSigner(block_size=3)
    s.on_file_open(str(f))
    for r in recs:
        s.on_record_write(r)
    sig = s.on_file_close()
    # the streaming form writes the SAME manifest the batch form
    # verifies — one chain definition
    ok, detail = verify_file(str(f), sig)
    assert ok, detail


def test_omfile_sig_provider_e2e(spark, tmp_path):
    """Config-bound signing: omfile action with sig.provider writes
    chain manifests beside every part file; tools/logverify.py
    verifies, and fails after a byte flip."""
    import os
    from rsyslog_spark.config.runtime import run_config_batch

    src = tmp_path / "in.log"
    src.write_text("".join(
        f"<13>Mar  1 10:00:00 h1 app: message {i}\n" for i in range(20)))
    out = tmp_path / "out"
    conf = f'''
template(name="t" type="string" string="%msg%\\n")
ruleset(name="m") {{
  action(type="omfile" file="{out}" template="t"
         sig.provider="ksi_ls12" sig.block.sizelimit="4")
}}
input(type="imfile" file="{src}" ruleset="m")
'''
    run_config_batch(spark, conf)
    parts = [p for p in os.listdir(out)
             if p.startswith("part") and not p.endswith(".sig")]
    assert parts and all(
        os.path.exists(out / (p + ".sig")) for p in parts)
    ok, details = verify_directory(str(out))
    assert ok, details

    proc = subprocess.run(
        [sys.executable, "tools/logverify.py", str(out)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    # tamper: flip one byte in the largest part file
    victim = max(parts, key=lambda p: os.path.getsize(out / p))
    data = bytearray((out / victim).read_bytes())
    data[len(data) // 2] ^= 0x01
    (out / victim).write_bytes(bytes(data))
    proc = subprocess.run(
        [sys.executable, "tools/logverify.py", str(out)],
        capture_output=True, text=True)
    assert proc.returncode == 1
