"""At-rest log encryption provider (lmcry analog).

ref: runtime/lmcry_gcry.c (provider binding + cry.* params),
runtime/libgcry.c (block cipher, ``.encinfo`` side file, zero
padding), runtime/libcry_common.c (cryGetKeyFromFile /
cryGetKeyFromProg), tools/rscryutil.c (standalone decrypt tool —
our analog is tools/logdec.py).

File format parity with the reference:

- Ciphertext replaces the log file's plaintext bytes in place (same
  path); the metadata lives in a side file ``<file>.encinfo``
  (libcry_common.h ENCINFO_SUFFIX) of LF-terminated
  ``TYPE:value`` records:
    ``FILETYPE:rsyslog-enrcyption-info``  (first line — the
        reference's RSGCRY_FILETYPE_NAME, typo and all,
        libcry_common.h:31)
    ``IV:<hex>``   block start + the IV used (libgcry.c:330)
    ``END:<int>``  byte offset where the block ends (libgcry.c:345)
  Every IV record is followed by an END record; a file closed and
  reopened appends a new IV/END pair (new block, fresh IV).
- Cipher default AES128 / CBC (lmcry_gcry.c GCRY_CIPHER_AES128 +
  GCRY_CIPHER_MODE_CBC defaults); ``cry.algo`` accepts AES128/
  AES192/AES256, ``cry.mode`` CBC or CTR.
- Each written buffer is zero-padded to the cipher block length
  (libgcry.c addPadding pads with 0x00); decryption strips NUL bytes
  (removePadding) — line-oriented log data never contains NULs, the
  same constraint the reference relies on.
- Key sourcing (libcry_common.c): ``cry.key`` literal,
  ``cry.keyfile`` (whole file content, ≤64 KiB, must be non-empty),
  ``cry.keyprogram`` (stdout of the program). The key length must
  equal the algorithm's key length — mismatch is a hard config error
  naming the required length (libgcry.c rsgcrySetKey returns the
  required len; tests/queue-encryption-disk_keyprog-invalid-len.sh).

The heavy lifting uses the ``cryptography`` package (OpenSSL-backed,
the same library family as the reference's lmcry_ossl provider); the
import is deferred so the rest of the engine works without it.
"""

from __future__ import annotations

import os
import subprocess

ENCINFO_SUFFIX = ".encinfo"
FILETYPE_NAME = "rsyslog-enrcyption-info"   # sic — reference typo

_ALGO_KEYLEN = {"AES128": 16, "AES192": 24, "AES256": 32}
_BLOCK_LEN = 16  # AES block length, all variants


def _cipher(key: bytes, iv: bytes, mode: str):
    try:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "at-rest encryption needs the 'cryptography' package "
            "(the lmcry analog is OpenSSL-backed like lmcry_ossl)"
        ) from exc
    m = modes.CBC(iv) if mode == "CBC" else modes.CTR(iv)
    return Cipher(algorithms.AES(key), m)


def get_key_from_file(path: str) -> bytes:
    """cryGetKeyFromFile (libcry_common.c:49): the file's exact bytes
    are the key — no trimming, no decoding; ≤64 KiB, non-empty."""
    size = os.path.getsize(path)
    if size > 64 * 1024:
        raise ValueError(f"keyfile {path} too large ({size} bytes)")
    if size == 0:
        raise ValueError(f"keyfile {path} is empty")
    with open(path, "rb") as fh:
        return fh.read()


def get_key_from_program(cmd: str) -> bytes:
    """cryGetKeyFromProg (libcry_common.c:178): run the program, its
    stdout is the key (the reference reads the pipe to EOF)."""
    out = subprocess.run(cmd, shell=True, capture_output=True,
                         check=True).stdout
    if not out:
        raise ValueError(f"keyprogram {cmd!r} produced no key")
    return out


class CryProvider:
    """One configured provider = one key + algo/mode, shared by every
    file the binding action writes (lmcry_gcry.c pData)."""

    def __init__(self, key: bytes | str | None = None,
                 keyfile: str | None = None,
                 keyprogram: str | None = None,
                 algo: str = "AES128", mode: str = "CBC"):
        algo = algo.upper()
        mode = mode.upper()
        if algo not in _ALGO_KEYLEN:
            raise ValueError(f"unsupported cry.algo {algo!r} "
                             f"(supported: {sorted(_ALGO_KEYLEN)})")
        if mode not in ("CBC", "CTR"):
            raise ValueError(f"unsupported cry.mode {mode!r}")
        if keyprogram:
            kb = get_key_from_program(keyprogram)
        elif keyfile:
            kb = get_key_from_file(keyfile)
        elif key is not None:
            kb = key.encode() if isinstance(key, str) else key
        else:
            raise ValueError(
                "one of cry.key / cry.keyfile / cry.keyprogram required")
        need = _ALGO_KEYLEN[algo]
        if len(kb) != need:
            # rsgcrySetKey: wrong length is a hard error carrying the
            # required length (libgcry.c:470)
            raise ValueError(
                f"invalid key length {len(kb)} for {algo}; "
                f"required: {need}")
        self.key = kb
        self.algo = algo
        self.mode = mode

    # --- block primitives -------------------------------------------------

    def _pad(self, data: bytes) -> bytes:
        """addPadding (libgcry.c): zero-pad to the cipher block len."""
        npad = (-len(data)) % _BLOCK_LEN
        return data + b"\x00" * npad

    def encrypt_file(self, path: str, iv: bytes | None = None) -> str:
        """Encrypt a written log file in place and write its
        ``.encinfo`` side file (one block: IV + END). Returns the
        side-file path."""
        iv = iv if iv is not None else os.urandom(_BLOCK_LEN)
        with open(path, "rb") as fh:
            plain = fh.read()
        enc = _cipher(self.key, iv, self.mode).encryptor()
        ct = enc.update(self._pad(plain)) + enc.finalize()
        with open(path, "wb") as fh:
            fh.write(ct)
        ei = path + ENCINFO_SUFFIX
        new = not os.path.exists(ei)
        with open(ei, "a", encoding="ascii") as fh:
            if new:
                fh.write(f"FILETYPE:{FILETYPE_NAME}\n")
            fh.write(f"IV:{iv.hex()}\n")
            fh.write(f"END:{len(ct)}\n")
        return ei

    def decrypt_file(self, path: str, encinfo: str | None = None
                     ) -> bytes:
        """rscryutil.c role: walk the IV/END blocks of the side file
        and decrypt each; NUL padding is stripped (removePadding)."""
        ei = encinfo or (path + ENCINFO_SUFFIX)
        blocks = read_encinfo(ei)
        with open(path, "rb") as fh:
            data = fh.read()
        out = bytearray()
        pos = 0
        for iv, end in blocks:
            seg = data[pos:end]
            dec = _cipher(self.key, iv, self.mode).decryptor()
            out += dec.update(seg) + dec.finalize()
            pos = end
        return bytes(out).replace(b"\x00", b"")

    def encrypt_directory(self, path: str) -> list[str]:
        """Encrypt every committed part file of a text-sink directory
        (dynafile/partitioned case — one block per part, same
        per-file scope the reference keeps per open fd)."""
        out = []
        for name in sorted(os.listdir(path)):
            # skip side files: .encinfo (ours), .crc (hadoop), .sig
            # (sigprov manifests — the reference's cryprov encrypts
            # the log stream, not the signature files)
            if name.startswith("part") and not name.endswith(
                    (ENCINFO_SUFFIX, ".crc", ".sig")):
                out.append(self.encrypt_file(os.path.join(path, name)))
        return out


def read_encinfo(path: str) -> list[tuple[bytes, int]]:
    """Parse an ``.encinfo`` side file → [(iv, end_offset), ...].
    Rejects files without the FILETYPE first record (libgcry.c:186
    does the same strncmp)."""
    with open(path, encoding="ascii") as fh:
        lines = [ln.rstrip("\n") for ln in fh]
    if not lines or lines[0] != f"FILETYPE:{FILETYPE_NAME}":
        raise ValueError(f"{path}: not a rsyslog encryption info file")
    blocks: list[tuple[bytes, int]] = []
    iv: bytes | None = None
    for ln in lines[1:]:
        rectype, _, val = ln.partition(":")
        if rectype == "IV":
            iv = bytes.fromhex(val)
        elif rectype == "END":
            if iv is None:
                raise ValueError(f"{path}: END record without IV")
            blocks.append((iv, int(val)))
            iv = None
        # unknown record types are skipped — the reference's format
        # note says types "can simply be extended in the future"
    if iv is not None:
        raise ValueError(f"{path}: IV record without END")
    return blocks


def provider_from_params(params: dict) -> "CryProvider":
    """Build from action params (lmcry_gcry.c cnfpdescrRegular:
    cry.key / cry.keyfile / cry.keyprogram / cry.mode / cry.algo)."""
    return CryProvider(
        key=params.get("cry.key"),
        keyfile=params.get("cry.keyfile"),
        keyprogram=params.get("cry.keyprogram"),
        algo=str(params.get("cry.algo", "AES128")),
        mode=str(params.get("cry.mode", "CBC")),
    )
