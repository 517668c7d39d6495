"""Log-signature provider: tamper-evident hash chains over omfile
output (ref: runtime/sigprov.h interface — OnFileOpen /
OnRecordWrite / OnFileClose; runtime/lmsig_ksi-ls12.c block signing;
tools/logsigner.c standalone signer; omfile.c:133-140 binds the
provider per action).

The KSI toolchain needs the Guardtime gateway; the Spark-shaped
analog keeps the part that makes logs auditable WITHOUT a network
service: a per-file SHA-256 hash chain with periodic block hashes,
written to a ``<file>.sig`` manifest. Any byte flip, record drop,
insert, or reorder changes every subsequent link, so verification
pinpoints the first bad block. A real KSI/TSA backend can
countersign the manifest's final hash — the chain below is exactly
the "aggregation input" such services sign.

Verify with ``tools/logverify.py`` (the logsigner.c role).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable

#: domain-separation seed for chain state x_0 (so an empty file's
#: chain differs from "no chain")
_SEED = b"rsyslog-spark-ls12-v1"
SIG_SUFFIX = ".sig"


def _h(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def chain_records(records: Iterable[bytes], block_size: int = 1000
                  ) -> dict:
    """Fold records into the hash chain:
    ``x_i = H(x_{i-1} || H(rec_i))`` with ``x_0 = H(seed)``.

    Returns the manifest payload: record count, final chain hash,
    and one intermediate chain hash per ``block_size`` records (the
    lmsig block structure — verification localizes tampering to a
    block without replaying the whole file)."""
    x = _h(_SEED)
    n = 0
    blocks: list[str] = []
    for rec in records:
        x = _h(x + _h(rec))
        n += 1
        if n % block_size == 0:
            blocks.append(x.hex())
    return {"algo": "sha256-chain-v1", "records": n,
            "block_size": block_size, "block_hashes": blocks,
            "chain": x.hex()}


def sign_file(path: str, block_size: int = 1000) -> str:
    """Chain-sign one rendered text file (newline-separated records,
    the omfile shape) → writes ``<path>.sig``; returns the sig path."""
    with open(path, "rb") as fh:
        data = fh.read()
    recs = data.split(b"\n")
    if recs and recs[-1] == b"":
        recs.pop()
    manifest = chain_records(recs, block_size)
    manifest["file"] = os.path.basename(path)
    sig = path + SIG_SUFFIX
    with open(sig, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, sort_keys=True)
    return sig


def verify_file(path: str, sig_path: str | None = None
                ) -> tuple[bool, str]:
    """Recompute the chain and compare with the manifest. Returns
    (ok, detail); on mismatch the detail names the first bad block."""
    sig_path = sig_path or path + SIG_SUFFIX
    try:
        with open(sig_path, encoding="utf-8") as fh:
            manifest = json.load(fh)
    except OSError as exc:
        return False, f"missing signature: {exc}"
    with open(path, "rb") as fh:
        data = fh.read()
    recs = data.split(b"\n")
    if recs and recs[-1] == b"":
        recs.pop()
    got = chain_records(recs, int(manifest.get("block_size", 1000)))
    if got["records"] != manifest.get("records"):
        return False, (f"record count changed: {got['records']} != "
                       f"{manifest.get('records')}")
    for i, (g, w) in enumerate(zip(got["block_hashes"],
                                   manifest.get("block_hashes", []))):
        if g != w:
            return False, f"chain mismatch in block {i}"
    if got["chain"] != manifest.get("chain"):
        return False, "final chain hash mismatch"
    return True, "ok"


def sign_directory(path: str, block_size: int = 1000) -> list[str]:
    """Sign every committed part file of a text-sink directory (the
    dynafile / partitioned-write case: one chain per part file, the
    same per-fd chain scope the reference keeps per dynafile)."""
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith("part") and not name.endswith(SIG_SUFFIX):
            out.append(sign_file(os.path.join(path, name), block_size))
    return out


def verify_directory(path: str) -> tuple[bool, list[str]]:
    details = []
    ok_all = True
    for name in sorted(os.listdir(path)):
        if name.startswith("part") and not name.endswith(SIG_SUFFIX):
            ok, detail = verify_file(os.path.join(path, name))
            ok_all &= ok
            details.append(f"{name}: {detail}")
    return ok_all, details


class HashChainSigner:
    """Streaming/record-at-a-time form of the provider, one instance
    per open file — the literal sigprov.h surface (OnFileOpen →
    OnRecordWrite* → OnFileClose) for bridge-style writers."""

    def __init__(self, block_size: int = 1000):
        self.block_size = block_size
        self._path: str | None = None
        self._x: bytes = b""
        self._n = 0
        self._blocks: list[str] = []

    def on_file_open(self, path: str) -> None:
        self._path = path
        self._x = _h(_SEED)
        self._n = 0
        self._blocks = []

    def on_record_write(self, rec: bytes) -> None:
        self._x = _h(self._x + _h(rec))
        self._n += 1
        if self._n % self.block_size == 0:
            self._blocks.append(self._x.hex())

    def on_file_close(self) -> str:
        assert self._path is not None, "on_file_open first"
        manifest = {"algo": "sha256-chain-v1", "records": self._n,
                    "block_size": self.block_size,
                    "block_hashes": self._blocks,
                    "chain": self._x.hex(),
                    "file": os.path.basename(self._path)}
        sig = self._path + SIG_SUFFIX
        with open(sig, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, sort_keys=True)
        self._path = None
        return sig
