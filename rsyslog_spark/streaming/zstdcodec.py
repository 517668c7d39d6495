"""zstd codec injection point (SURVEY §2.1/§2.9
compression.driver="zstd" — imtcp.c:376-411, tools/omfwd.c
compression.driver).

The reference requires rsyslog built against libzstd; this engine's
analog is the ``zstandard`` Python package. Environments without it
get the same config-time error the reference emits for an un-built
libzstd — but a host may also INJECT a compatible codec object via
``set_codec`` (the engine-injectable pattern used for omczmq/
omrabbitmq client libs), which the compression paths then use. A
codec must expose the ``zstandard`` surface actually consumed:

- ``ZstdCompressor(level=N).compressobj()`` → ``.compress(bytes)`` /
  ``.flush()``
- ``ZstdDecompressor().decompressobj()`` → ``.decompress(bytes)``
"""

from __future__ import annotations

_codec = None


def set_codec(mod) -> None:
    """Inject a zstandard-compatible codec (None resets to the
    import-probe default)."""
    global _codec
    _codec = mod


def get_codec():
    """The injected codec, else the real ``zstandard`` package when
    importable, else None (callers raise the config-time error).

    Callers that ship work to Spark executors must resolve this ON
    THE DRIVER and close over the result — the injection is
    process-local and never reaches Python workers by itself."""
    if _codec is not None:
        return _codec
    try:
        import zstandard
        return zstandard
    except ImportError:
        return None


class ZlibBackedZstd:
    """zlib-backed codec with the consumed ``zstandard`` surface —
    NOT real zstd wire format; an injectable stand-in for
    environments without the package (tests, loopback pipelines
    where both ends are this engine). Lives in the package so Spark
    workers can unpickle closures that captured it by reference."""

    class ZstdCompressor:
        def __init__(self, level: int = 3):
            self.level = min(max(int(level), 1), 9)

        def compressobj(self):
            import zlib
            return zlib.compressobj(self.level)

    class ZstdDecompressor:
        def decompressobj(self):
            import zlib
            return zlib.decompressobj()
