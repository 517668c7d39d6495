"""mmsnareparse routing tables + definition-file loader.

The reference parser routes every ``Key: value`` pair of a Windows
event description through a pattern table: a pattern carries a
canonical field name, a value type, and an optional TARGET SECTION
that can differ from the section the pair appears under lexically
(ref: plugins/mmsnareparse/mmsnareparse.c:197-383 g_coreFieldPatterns,
:508-548 g_builtinSectionDescriptors, :564-621 g_eventMappings,
select_field_pattern :3472). Custom tables load from
``definition.file`` / ``definition.json`` (load_custom_definition_*,
mmsnareparse.c:2329-2750).

Value types (field_value_type_t, mmsnareparse.c:120-132): strings
store verbatim; int64 stores a JSON number (fallback string on parse
failure); bool maps true/yes/enabled/on / false/no/disabled/off;
guid / ip / timestamp VALIDATE and on failure store the raw string
plus a ``Validation!Errors`` entry "<Key>: invalid <what>"
(store_validated_string :3557, handle_parsing_error :3778);
logon_type adds the canonical LogonTypeName (g_logonTypeMap :550).
Placeholder values ("-", "N/A", ...) are dropped entirely
(is_placeholder_value :788).
"""
from __future__ import annotations

import json

# value-type tags: str int intraw bool guid ip ts logon rcg priv
_VT = {"string": "str", "int64": "int", "int64_with_raw": "intraw",
       "int64withraw": "intraw", "bool": "bool", "boolean": "bool",
       "guid": "guid", "ip_address": "ip", "ipaddress": "ip",
       "ip": "ip", "timestamp": "ts", "logon_type": "logon",
       "logontype": "logon", "json": "str",
       "remote_credential_guard": "rcg", "privilege_list": "priv"}

#: lowercase placeholder values dropped before storage
#: (mmsnareparse.c:788 is_placeholder_value)
SNARE_PLACEHOLDERS = (
    "-", "n/a", "null", "none", "not available", "unknown",
    "<never>", "<value not set>", "<not set>")

#: LogonType → canonical name (mmsnareparse.c:550 g_logonTypeMap)
SNARE_LOGON_TYPES = {
    "0": "System", "1": "System", "2": "Interactive", "3": "Network",
    "4": "Batch", "5": "Service", "7": "Unlock",
    "8": "NetworkCleartext", "9": "NewCredentials",
    "10": "RemoteInteractive", "11": "CachedInteractive",
    "12": "CachedRemoteInteractive", "13": "CachedUnlock"}

#: builtin description sections: (pattern, canonical, behavior)
#: behavior: std = key/value walk section; inline = Remote Credential
#: Guard one-value form; semi = 'K=V; K2=V2' LAPS form; list =
#: privilege-name list. Patterns match the header token exactly
#: unless they end with '*' (wildcard_match, mmsnareparse.c:2825).
#: "EventData" is accepted as a section header so typed root blocks
#: land where mmsnareparse-value-types.sh expects them.
SNARE_BUILTIN_SECTIONS: list[tuple[str, str, str]] = [
    ("Subject", "Subject", "std"),
    ("Logon Information", "LogonInformation", "std"),
    ("New Logon", "NewLogon", "std"),
    ("Account For Which Logon Failed", "TargetAccount", "std"),
    ("Failure Information", "Failure", "std"),
    ("Network Information", "Network", "std"),
    ("Process Information", "Process", "std"),
    ("Detailed Authentication Information", "DetailedAuthentication",
     "std"),
    ("Application Information", "Application", "std"),
    ("Filter Information", "Filter", "std"),
    ("Account Information", "AccountInformation", "std"),
    ("Service Information", "Service", "std"),
    ("Additional Information", "AdditionalInformation", "std"),
    ("Share Information", "Share", "std"),
    ("Certificate Information", "Certificate", "std"),
    ("TLS Inspection", "TLSInspection", "std"),
    ("EventData", "EventData", "std"),
    ("Remote Credential Guard", "RemoteCredentialGuard", "inline"),
    ("LAPS Context", "LAPS", "semi"),
    ("Privileges", "Privileges", "list"),
]

#: core field patterns: (canonical, vtype, target_section, priority).
#: target_section None = "generic": the field stays in its lexical
#: section (or EventData at root). A non-None target REROUTES the
#: field there when no lexical/generic pattern matched — this is how
#: 'Ticket Options' inside 'Additional Information' lands in
#: $!win!Kerberos (mmsnareparse.c:197-383; mmsnareparse-kerberos.sh).
#: Divergence pin: PreviousTime/NewTime target EventData (not the
#: reference table's generic+Process rows) — mmsnareparse-value-types
#: .sh asserts win.EventData.PreviousTime for the 4616 sample.
SNARE_CORE_FIELDS: list[tuple[str, str, str | None, int]] = [
    ("LogonType", "logon", None, 10),
    ("SecurityID", "str", None, 10),
    ("AccountName", "str", None, 10),
    ("AccountDomain", "str", None, 10),
    ("LogonID", "str", None, 10),
    ("LinkedLogonID", "str", None, 10),
    ("NetworkAccountName", "str", None, 10),
    ("LogonGUID", "guid", None, 10),
    ("ProcessID", "str", None, 10),
    ("ProcessName", "str", None, 10),
    ("ProcessCommandLine", "str", None, 10),
    ("TokenElevationType", "str", None, 10),
    ("MandatoryLabel", "str", None, 10),
    ("WorkstationName", "str", None, 10),
    ("SourceNetworkAddress", "ip", None, 10),
    ("SourcePort", "int", None, 10),
    ("ClientPort", "int", None, 10),
    ("DestinationPort", "int", None, 10),
    ("LogonProcess", "str", None, 10),
    ("AuthenticationPackage", "str", None, 10),
    ("TransitedServices", "str", None, 10),
    ("PackageName", "str", None, 10),
    ("RestrictedAdminMode", "str", None, 10),
    ("VirtualAccount", "str", None, 10),
    ("ElevatedToken", "str", None, 10),
    ("ImpersonationLevel", "str", None, 10),
    ("PreviousTime", "ts", "EventData", 10),
    ("NewTime", "ts", "EventData", 10),
    ("LastLogon", "ts", None, 10),
    ("LastLogoff", "ts", None, 10),
    ("LastSuccessfulLogon", "ts", None, 10),
    ("LastFailedLogon", "ts", None, 10),
    ("LockoutTime", "ts", None, 10),
    ("PasswordLastSet", "ts", None, 10),
    ("AccountExpires", "ts", None, 10),
    ("KeyLength", "int", None, 10),
    ("RemoteCredentialGuard", "rcg", None, 10),
    ("Privileges", "priv", None, 10),
    # section-scoped rows (priority base+10)
    ("SecurityID", "str", "Subject", 20),
    ("AccountName", "str", "Subject", 20),
    ("AccountDomain", "str", "Subject", 20),
    ("LogonID", "str", "Subject", 20),
    ("LogonInformation", "str", "LogonInformation", 20),
    ("LogonType", "logon", "LogonInformation", 20),
    ("RestrictedAdminMode", "str", "LogonInformation", 20),
    ("VirtualAccount", "str", "LogonInformation", 20),
    ("ElevatedToken", "str", "LogonInformation", 20),
    ("ImpersonationLevel", "str", "LogonInformation", 20),
    ("SecurityID", "str", "NewLogon", 20),
    ("AccountName", "str", "NewLogon", 20),
    ("AccountDomain", "str", "NewLogon", 20),
    ("LogonID", "str", "NewLogon", 20),
    ("NewLogon", "str", "NewLogon", 20),
    ("LinkedLogonID", "str", "NewLogon", 20),
    ("NetworkAccountName", "str", "NewLogon", 20),
    ("NetworkAccountDomain", "str", "NewLogon", 20),
    ("LogonGUID", "guid", "NewLogon", 20),
    ("NetworkInformation", "str", "Network", 20),
    ("WorkstationName", "str", "Network", 20),
    ("SourceNetworkAddress", "ip", "Network", 20),
    ("SourcePort", "int", "Network", 20),
    ("NetworkAddress", "ip", "Network", 20),
    ("ClientAddress", "ip", "Network", 20),
    ("ClientPort", "int", "Network", 20),
    ("DestinationAddress", "ip", "Network", 20),
    ("DestinationPort", "int", "Network", 20),
    ("Protocol", "str", "Network", 20),
    ("Direction", "str", "Network", 20),
    ("LastLogon", "ts", "AccountInformation", 20),
    ("LastLogoff", "ts", "AccountInformation", 20),
    ("LastSuccessfulLogon", "ts", "AccountInformation", 20),
    ("LastFailedLogon", "ts", "AccountInformation", 20),
    ("LockoutTime", "ts", "AccountInformation", 20),
    ("PasswordLastSet", "ts", "AccountInformation", 20),
    ("AccountExpires", "ts", "AccountInformation", 20),
    ("ProcessInformation", "str", "Process", 20),
    ("CallerProcessID", "str", "Process", 20),
    ("CallerProcessName", "str", "Process", 20),
    ("NewProcessID", "str", "Process", 20),
    ("NewProcessName", "str", "Process", 20),
    ("CreatorProcessID", "str", "Process", 20),
    ("CreatorProcessName", "str", "Process", 20),
    ("ProcessCommandLine", "str", "Process", 20),
    ("DetailedAuthenticationInformation", "str", "Authentication",
     20),
    ("LogonProcess", "str", "Authentication", 20),
    ("AuthenticationPackage", "str", "Authentication", 20),
    ("TransitedServices", "str", "Authentication", 20),
    ("PackageName", "str", "Authentication", 20),
    ("KeyLength", "int", "Authentication", 20),
    ("RemoteCredentialGuard", "rcg", "Authentication", 20),
    ("FailureInformation", "str", "Failure", 20),
    ("FailureReason", "str", "Failure", 20),
    ("Status", "str", "Failure", 20),
    ("SubStatus", "str", "Failure", 20),
    ("PolicyName", "str", "WDAC", 20),
    ("PolicyVersion", "str", "WDAC", 20),
    ("EnforcementMode", "str", "WDAC", 20),
    ("User", "str", "WDAC", 20),
    ("PID", "intraw", "WDAC", 20),
    ("PolicyID", "str", "WUFB", 20),
    ("Ring", "str", "WUFB", 20),
    ("FromService", "str", "WUFB", 20),
    ("EnforcementResult", "str", "WUFB", 20),
    ("ServiceName", "str", "Kerberos", 20),
    ("ServiceID", "str", "Kerberos", 20),
    ("TicketOptions", "str", "Kerberos", 20),
    ("ResultCode", "str", "Kerberos", 20),
    ("TicketEncryptionType", "str", "Kerberos", 20),
    ("PreAuthenticationType", "str", "Kerberos", 20),
    ("CertificateInfo", "str", "Kerberos", 20),
    ("LAPSContext", "str", "LAPS", 20),
    ("PolicyVersion", "int", "LAPS", 20),
    ("CredentialRotation", "bool", "LAPS", 20),
    ("TLSInspection", "str", "TLSInspection", 20),
    ("Reason", "str", "TLSInspection", 20),
    ("Policy", "str", "TLSInspection", 20),
    ("FilterInformation", "str", "Filter", 20),
    ("FilterRuntimeID", "str", "Filter", 20),
    ("LayerName", "str", "Filter", 20),
    ("LayerRuntimeID", "str", "Filter", 20),
]

#: per-event pattern overrides (g_eventFieldMappings,
#: mmsnareparse.c:384-405): priority FIELD_PRIORITY_EVENT_OVERRIDE
SNARE_EVENT_FIELDS: dict[int, list[tuple[str, str, str | None, int]]] = {
    6281: [("PolicyName", "str", "WDAC", 100),
           ("PolicyVersion", "str", "WDAC", 100),
           ("EnforcementMode", "str", "WDAC", 100),
           ("User", "str", "WDAC", 100),
           ("PID", "intraw", "WDAC", 100)],
    1243: [("PolicyID", "str", "WUFB", 100),
           ("Ring", "str", "WUFB", 100),
           ("FromService", "str", "WUFB", 100),
           ("EnforcementResult", "str", "WUFB", 100)],
}

#: EventID → (Category, Subtype, Outcome-or-None) —
#: g_eventMappings (mmsnareparse.c:564-621). Outcome None derives
#: from the audit-result token (derive_outcome :3765).
SNARE_EVENTS: dict[int, tuple[str, str, str | None]] = {
    4624: ("Logon", "Success", "success"),
    4625: ("Logon", "Failure", "failure"),
    4626: ("Logon", "Success", "success"),
    4627: ("Logon", "Success", "success"),
    4672: ("Privilege", "Assignment", "success"),
    4688: ("Process", "Creation", "success"),
    4768: ("Kerberos", "TGTRequest", None),
    4769: ("Kerberos", "ServiceTicket", None),
    4771: ("Kerberos", "PreAuthFailure", None),
    5140: ("FileShare", "Access", None),
    5157: ("FilteringPlatform", "PacketDrop", "failure"),
    6281: ("WDAC", "Enforcement", None),
    1102: ("Audit", "LogCleared", None),
    1243: ("WindowsUpdate", "Deployment", None),
    4720: ("AccountManagement", "Creation", "success"),
    4722: ("AccountManagement", "Enabled", "success"),
    4723: ("AccountManagement", "PasswordChangeAttempt", "success"),
    4724: ("AccountManagement", "PasswordReset", "success"),
    4725: ("AccountManagement", "AccountDisabled", "success"),
    4726: ("AccountManagement", "AccountDeleted", "success"),
    4738: ("AccountManagement", "AccountChange", "success"),
    4781: ("AccountManagement", "AccountNameChange", "success"),
    4650: ("IPsec", "MainModeEstablished", "success"),
    4651: ("IPsec", "MainModeFailure", "failure"),
    4652: ("IPsec", "QuickModeEstablished", "success"),
    4653: ("IPsec", "QuickModeFailure", "failure"),
    4654: ("IPsec", "MainModeAuthFailure", "failure"),
    4655: ("IPsec", "MainModeAuthFailure", "failure"),
    4656: ("IPsec", "MainModeKeyFailure", "failure"),
    4657: ("IPsec", "MainModePeerAuthFailure", "failure"),
    4658: ("IPsec", "MainModeInvalidCookie", "failure"),
    4659: ("IPsec", "MainModeDuplicateSPI", "failure"),
    4660: ("IPsec", "MainModeInvalidProposal", "failure"),
    4661: ("IPsec", "MainModeTimeout", "failure"),
    4663: ("IPsec", "MainModeTimeout", "failure"),
    4664: ("IPsec", "MainModeTimeout", "failure"),
    4665: ("IPsec", "MainModeTimeout", "failure"),
    4666: ("IPsec", "MainModeTimeout", "failure"),
    4667: ("IPsec", "MainModeTimeout", "failure"),
    4668: ("IPsec", "MainModeTimeout", "failure"),
    4670: ("IPsec", "MainModeTimeout", "failure"),
    4671: ("IPsec", "MainModeTimeout", "failure"),
    4608: ("System", "Startup", "success"),
    4609: ("System", "Shutdown", "success"),
    4610: ("System", "Startup", "success"),
    4611: ("System", "Shutdown", "success"),
    4612: ("System", "AuditLogCleared", "success"),
    4614: ("System", "AuditLogCleared", "success"),
    4615: ("System", "IPCStatusChange", "success"),
    4616: ("System", "SystemTimeChange", "success"),
    4618: ("System", "SecurityStateChange", "success"),
    4621: ("System", "AdminLogon", "success"),
    4622: ("System", "Logon", "success"),
    4697: ("System", "ServiceInstalled", "success"),
    4821: ("System", "CertificateServices", "success"),
    4822: ("System", "CertificateServices", "success"),
    4823: ("System", "CertificateServices", "success"),
    4824: ("System", "CertificateServices", "success"),
    4830: ("System", "CertificateServices", "success"),
}


def _canon_label(label: str) -> str:
    """normalize_label (mmsnareparse.c:1057): drop parenthesised
    runs, strip non-alphanumerics, capitalize word starts."""
    out, upper, depth = [], True, 0
    for ch in label:
        if ch == "(":
            depth += 1
            upper = True
            continue
        if ch == ")" and depth > 0:
            depth -= 1
            upper = True
            continue
        if depth > 0:
            continue
        if ch.isalnum():
            out.append(ch.upper() if upper else ch)
            upper = False
        else:
            upper = True
    return "".join(out)


def load_snare_definitions(source) -> dict:
    """Parse a ``definition.file`` / ``definition.json`` payload
    (path, JSON text, or dict) into the runtime-table shape
    (mmsnareparse.c load_section_definitions :2329,
    load_field_definitions :2420, load_event_field_definitions
    :2510, load_event_metadata_definitions :2654).

    Returns ``{"sections": [(pattern, canonical, behavior)],
    "fields": [(canon, vtype, section, prio)], "event_fields":
    {id: [...]}, "events": {id: (cat, sub, outcome)}}``.
    """
    if isinstance(source, dict):
        doc = source
    else:
        text = str(source)
        if text.lstrip().startswith("{"):
            doc = json.loads(text)
        else:
            with open(text, encoding="utf-8") as fh:
                doc = json.load(fh)

    def field_row(entry) -> tuple[str, str, str | None, int]:
        pat = entry["pattern"]
        canon = entry.get("canonical") or _canon_label(pat)
        vt = _VT.get(str(entry.get("value_type", "string")).lower(),
                     "str")
        return (canon, vt, entry.get("section"),
                int(entry.get("priority", 10)))

    out = {"sections": [], "fields": [], "event_fields": {},
           "events": {}}
    for s in doc.get("sections", []) or []:
        pat = s["pattern"]
        canon = s.get("canonical") or _canon_label(pat.rstrip("*"))
        behavior = {"standard": "std", "inline_value": "inline",
                    "semicolon": "semi", "list": "list"}.get(
                        str(s.get("behavior", "standard")).lower(),
                        "std")
        out["sections"].append((pat, canon, behavior))
    for f in doc.get("fields", []) or []:
        out["fields"].append(field_row(f))
    for ef in doc.get("eventFields", []) or []:
        rows = [field_row(p) + ()
                for p in ef.get("patterns", []) or []]
        # event-override rows dominate core rows (prio 100 analog)
        rows = [(c, v, s, max(pr, 100)) for (c, v, s, pr) in rows]
        out["event_fields"][int(ef["event_id"])] = rows
    for ev in doc.get("events", []) or []:
        out["events"][int(ev["event_id"])] = (
            ev.get("category"), ev.get("subtype"), ev.get("outcome"))
    return out
