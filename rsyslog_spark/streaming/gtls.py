"""TLS stream driver — the gtls/ossl network-stream-driver analog
(ref: runtime/nsd_gtls.c, runtime/nsd_ossl.c, runtime/netstrm.c).

The reference separates transport inputs (imtcp, omfwd) from the
stream driver that secures them (``StreamDriver.Name="gtls"``,
``StreamDriver.Mode="1"``, ``StreamDriver.AuthMode=...``).  This
module is that separation point for the Python-side bridges: a
picklable :class:`TLSConfig` plus context builders over stdlib
``ssl`` (the container's OpenSSL — the same library nsd_ossl links).
``imtcp(tls=...)`` wraps accepted connections server-side and
``omfwd_sink(tls=...)`` wraps the per-partition forward connection
client-side; the framing layers above are unchanged, exactly like
the reference's netstrm indirection.

Auth modes (nsd_gtls.c:COMMON auth handling):

* ``anon`` — encrypt only, no peer verification.
* ``x509/certvalid`` — peer must present a certificate that chains
  to ``cafile``.
* ``x509/name`` — certvalid + the peer certificate's CN / SAN DNS
  names must match one of ``permitted_peers`` (wildcards allowed,
  like the reference's PermittedPeer globs).
* ``x509/fingerprint`` — the DER SHA1/SHA256 digest must match one
  of ``permitted_fingerprints`` (``SHA1:xx:yy:...`` format,
  nsd_gtls.c GenFingerprintStr).  stdlib ssl cannot accept an
  unverifiable chain, so pin the peer's (self-signed) certificate
  as ``cafile`` — the fingerprint is then checked on top.
"""

from __future__ import annotations

import hashlib
import ssl
from dataclasses import dataclass, field


def permitted_peer_match(name: str, peer: str) -> bool:
    """The reference's PermittedPeer wildcard semantics
    (runtime/net.c:150-460 AddPermittedPeerWildcard /
    PermittedPeerWildcardCompile / PermittedPeerWildcardMatch):

    - a peer with NO '*' anywhere compares with plain strcmp;
    - otherwise matching is COMPONENT-WISE over '.'-separated domain
      parts — '*' never crosses a dot (fnmatch-style globbing would
      wrongly let '*.example.net' accept 'a.b.example.net');
    - component forms: plain text (exact), '*' (matches any one
      component), '*suffix' (component ends with suffix), 'prefix*'
      (component starts with prefix), '' (component must be empty —
      e.g. a trailing dot);
    - component counts must agree exactly (net.c:383-386, 449-455);
    - '*' in the middle ('a*b') or doubled ('*a*') is an invalid
      wildcard (net.c:182-192 RS_RET_INVALID_WILDCARD) — treated as
      non-matching here (fail closed; the reference aborts compile
      and logs 'error compiling wildcard expression').
    """
    if "*" not in peer:
        return name == peer
    pcomps = peer.split(".")
    ncomps = name.split(".")
    if len(pcomps) != len(ncomps):
        return False
    for p, n in zip(pcomps, ncomps):
        if p == "*":
            continue
        if p == "":
            if n != "":
                return False
        elif p.startswith("*"):
            suffix = p[1:]
            if "*" in suffix:
                return False  # invalid wildcard — fail closed
            if not n.endswith(suffix):
                return False
        elif p.endswith("*"):
            prefix = p[:-1]
            if "*" in prefix:
                return False  # invalid wildcard — fail closed
            if not n.startswith(prefix):
                return False
        elif "*" in p:
            return False  # invalid wildcard — fail closed
        elif p != n:
            return False
    return True


@dataclass
class TLSConfig:
    certfile: str | None = None
    keyfile: str | None = None
    cafile: str | None = None
    authmode: str = "anon"
    permitted_peers: list[str] = field(default_factory=list)
    permitted_fingerprints: list[str] = field(default_factory=list)
    #: certificate revocation list (streamdriver.crlfile /
    #: $DefaultNetstreamDriverCRLFile; nsd_gtls.c:786-890) — loaded
    #: into the verify store with leaf CRL checking, and validity-
    #: checked at CONFIG TIME per the 2026-03-25 fix (GnuTLS
    #: silently ignored expired CRLs; the reference now rejects
    #: "CRL '%s' has expired" / "not yet valid" at load)
    crlfile: str | None = None
    #: streamdriver.PrioritizeSAN (imtcp.c:260; nsd_gtls.c:1227
    #: bSANpriority): RFC 6125 strictness — when SANs are present the
    #: CN is NOT consulted for x509/name matching
    prioritize_san: bool = False

    def __post_init__(self) -> None:
        valid = ("anon", "x509/certvalid", "x509/name",
                 "x509/fingerprint")
        if self.authmode not in valid:
            raise ValueError(f"unknown authmode {self.authmode!r}")
        if self.authmode != "anon" and not self.cafile:
            raise ValueError(f"{self.authmode} needs cafile")


class TLSSetupError(ValueError):
    """Config-time TLS material failure — message shapes follow
    nsd_ossl.c osslGlblInit error texts so configs/operators grepping
    the reference's diagnostics keep working
    (imtcp-tls-ossl-error-{ca,cert,key,key2}.sh content_checks)."""


def _base_context(cfg: TLSConfig, purpose) -> ssl.SSLContext:
    ctx = ssl.SSLContext(purpose)
    ctx.check_hostname = False  # peer auth is authmode-driven below
    if cfg.certfile:
        try:
            ctx.load_cert_chain(cfg.certfile, cfg.keyfile)
        except (OSError, ssl.SSLError) as exc:
            # distinguish the cert file vs the key like the
            # reference: a readable cert with a broken/missing key
            # is a Key error (osslGlblInit)
            import os
            what = ("Certificate file"
                    if not os.path.exists(cfg.certfile)
                    else "Key")
            raise TLSSetupError(
                f"Error: {what} could not be accessed. OpenSSL "
                f"Error Stack: {exc}") from exc
    if cfg.authmode == "anon":
        ctx.verify_mode = ssl.CERT_NONE
    else:
        try:
            ctx.load_verify_locations(cafile=cfg.cafile)
        except (OSError, ssl.SSLError) as exc:
            raise TLSSetupError(
                "Error: CA certificate could not be accessed. "
                f"OpenSSL Error Stack: {exc}") from exc
        ctx.verify_mode = ssl.CERT_REQUIRED
        if cfg.crlfile:
            _check_crl_validity(cfg.crlfile)
            try:
                ctx.load_verify_locations(cafile=cfg.crlfile)
            except (OSError, ssl.SSLError) as exc:
                raise TLSSetupError(
                    "error parsing Certificate revocation list "
                    f"(CRL) '{cfg.crlfile}': {exc}") from exc
            # leaf revocation checking — OpenSSL additionally
            # rejects expired CRLs at handshake with
            # X509_V_ERR_CRL_HAS_EXPIRED, the behavior the gtls
            # driver was fixed to match
            ctx.verify_flags |= ssl.VERIFY_CRL_CHECK_LEAF
    return ctx


def _check_crl_validity(crlfile: str) -> None:
    """Config-time CRL validity-period check (nsd_gtls.c:857-877,
    ChangeLog 2026-03-25): a CRL whose thisUpdate is in the future is
    'not yet valid'; one whose nextUpdate has passed 'has expired' —
    both reject at load instead of silently accepting connections.
    Needs the (public) pyca/cryptography parser; when absent the
    check is skipped and OpenSSL still rejects at handshake."""
    try:
        from cryptography import x509
    except ImportError:
        return
    import datetime

    with open(crlfile, "rb") as fh:
        data = fh.read()
    try:
        crl = x509.load_pem_x509_crl(data)
    except ValueError as exc:
        raise TLSSetupError(
            "error parsing Certificate revocation list (CRL) "
            f"'{crlfile}': {exc}") from exc
    now = datetime.datetime.now(datetime.timezone.utc)
    this_upd = getattr(crl, "last_update_utc", None)
    next_upd = getattr(crl, "next_update_utc", None)
    if this_upd is not None and now < this_upd:
        raise TLSSetupError(
            f"CRL '{crlfile}' is not yet valid (thisUpdate is in "
            "the future)")
    if next_upd is not None and now > next_upd:
        raise TLSSetupError(f"CRL '{crlfile}' has expired")


def server_context(cfg: TLSConfig) -> ssl.SSLContext:
    if not cfg.certfile:
        raise ValueError("TLS server needs certfile")
    return _base_context(cfg, ssl.PROTOCOL_TLS_SERVER)


def client_context(cfg: TLSConfig) -> ssl.SSLContext:
    return _base_context(cfg, ssl.PROTOCOL_TLS_CLIENT)


def check_peer(sock: ssl.SSLSocket, cfg: TLSConfig) -> None:
    """Post-handshake peer authorization; raises PermissionError on
    mismatch (the reference drops the session with the same log
    line shape: 'peer fingerprint/name not permitted')."""
    if cfg.authmode in ("anon", "x509/certvalid"):
        return
    if cfg.authmode == "x509/fingerprint":
        der = sock.getpeercert(binary_form=True) or b""
        fps = {
            "SHA1:" + ":".join(f"{b:02X}" for b in
                               hashlib.sha1(der).digest()),
            "SHA256:" + ":".join(f"{b:02X}" for b in
                                 hashlib.sha256(der).digest()),
        }
        allowed = {p.upper() for p in cfg.permitted_fingerprints}
        if not (fps & allowed):
            raise PermissionError(
                f"peer fingerprint not permitted: {sorted(fps)[0]}")
        return
    # x509/name: DNS SANs, IP-address SANs (ChangeLog 2025-10-28
    # "net: Add IP address SAN support" — nsd_gtls.c:1206-1221
    # renders IP SANs as text and runs them through the SAME
    # matcher), and the CN — unless PrioritizeSAN is on and SANs
    # exist (RFC 6125; nsd_gtls.c:1227 '!bSANpriority || !bHaveSAN')
    cert = sock.getpeercert() or {}
    sans = [v for k, v in cert.get("subjectAltName", ())
            if k in ("DNS", "IP Address")]
    names = list(sans)
    if not (cfg.prioritize_san and sans):
        names += [v for rdn in cert.get("subject", ())
                  for k, v in rdn if k == "commonName"]
    for peer_glob in cfg.permitted_peers:
        if any(permitted_peer_match(n, peer_glob) for n in names):
            return
    raise PermissionError(f"peer name not permitted: {names}")
