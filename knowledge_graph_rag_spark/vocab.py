"""Closed vocabularies of the knowledge-graph schema.

These reproduce — as *data*, not code — the reference's closed entity /
relation vocabularies and normalization tables, which are part of the query
semantics our extractor must match (SURVEY.md §2.3):

- entity types:       reference ``graph_extractor.py:15-60``  (29 types)
- relation types:     reference ``graph_extractor.py:62-125`` (~50 types)
- canonical-predicate map: ``graph_extractor.py:128-161``     (20 entries)
- direction semantics:     ``graph_extractor.py:181-191``     (9 predicates)
- security types + defaults: ``graph_extractor.py:406-411,436-450``
- well-known ports / suspicious ports: ``network_parser.py:24-53``
- suspicious-port descriptions: ``graph_anomaly_detector.py:292-301``

Stored as tuples / mappings so they can be turned into tiny broadcast-join
DataFrames (the Spark-native replacement for the reference's dict lookups).
"""

from __future__ import annotations

# --- Entity types (29) ------------------------------------------------------

GENERAL_ENTITY_TYPES: tuple[str, ...] = (
    "Person", "Organization", "Location", "Concept", "Event", "Product",
    "Date", "Document", "Technology",
)

TELEMETRY_ENTITY_TYPES: tuple[str, ...] = (
    "IPAddress", "InternalIP", "ExternalIP", "Port", "Protocol", "Service",
    "Device", "Domain", "Connection", "Session",
)

SECURITY_ENTITY_TYPES: tuple[str, ...] = (
    "Vulnerability", "Threat", "Attack", "AttackChain", "Indicator",
    "Evidence", "InitialAccess", "Execution", "Persistence",
    "PrivilegeEscalation", "CredentialAccess", "LateralMovement",
    "Collection", "Exfiltration", "CommandAndControl",
)

ENTITY_TYPES: tuple[str, ...] = (
    GENERAL_ENTITY_TYPES + TELEMETRY_ENTITY_TYPES + SECURITY_ENTITY_TYPES
)

# Types whose nodes get default confidence/source/severity properties
# (reference graph_extractor.py:406-411).
SECURITY_TYPES: frozenset[str] = frozenset(SECURITY_ENTITY_TYPES)

# Types with default severity=high (graph_extractor.py:441).
HIGH_SEVERITY_TYPES: frozenset[str] = frozenset(
    {"Attack", "Exfiltration", "CommandAndControl"}
)

# entity_class tagging (graph_extractor.py:444-450).
TELEMETRY_CLASS_TYPES: frozenset[str] = frozenset(
    {"InternalIP", "ExternalIP", "Port", "Protocol", "Connection", "Session"}
)


def entity_class_of(entity_type: str) -> str:
    """telemetry / security / semantic classification of a node type."""
    if entity_type in TELEMETRY_CLASS_TYPES:
        return "telemetry"
    if entity_type in SECURITY_TYPES:
        return "security"
    return "semantic"


# --- Relation types (~50) ---------------------------------------------------

RELATION_TYPES: tuple[str, ...] = (
    # general
    "WORKS_FOR", "LOCATED_IN", "FOUNDED_BY", "FOUNDED", "RELATED_TO",
    "PART_OF", "HAS_ROLE", "CREATED", "KNOWS", "INVOLVED_IN", "OWNS", "USES",
    "MENTIONS", "HAPPENED_ON", "HAS_PROPERTY", "FOUNDED_ON", "ACQUIRED_ON",
    "FOUNDER_OF", "EMPLOYED_BY", "CEO_OF", "RESIDES_IN", "LAUNCHED_ON",
    "RELEASED_ON", "OCCURRED_ON", "USES_TECHNOLOGY", "ACQUIRED",
    # network security
    "CONNECTED_TO", "USES_PORT", "RESOLVES_TO", "LOGGED_IN", "RUNS_SERVICE",
    "TRANSFERRED_TO", "FLAGGED_AS", "SCANNED", "ATTACKED", "EXPLOITS",
    "TARGETS",
    # attack chain
    "LEADS_TO", "FOLLOWED_BY", "RESULTS_IN", "PRECEDED_BY", "ENABLES",
    "INDICATES",
    # connection-centric
    "INITIATED", "SOURCE_OF", "TARGET_OF", "USED_PROTOCOL", "USED_PORT",
    "OCCURRED_AT", "TRANSFERRED_DATA",
    # evidence
    "SUPPORTED_BY", "OBSERVED_IN", "ATTRIBUTED_TO",
)

# --- Canonical-predicate rewriting (T4) -------------------------------------
# (source_type, target_type, raw_predicate) -> canonical predicate.
# Semantics of reference graph_extractor.py:128-161; applied via a 20-row
# broadcast-joined mapping DataFrame (see operators/extract.py).

SEMANTIC_RELATIONSHIP_MAP: dict[tuple[str, str, str], str] = {
    ("Date", "Organization", "CREATED"): "FOUNDED_ON",
    ("Date", "Organization", "FOUNDED_ON"): "FOUNDED_ON",
    ("Date", "Organization", "ESTABLISHED_ON"): "FOUNDED_ON",
    ("Date", "Organization", "STARTED_ON"): "FOUNDED_ON",
    ("Date", "Organization", "ACQUIRED"): "ACQUIRED_ON",
    ("Date", "Organization", "PURCHASED"): "ACQUIRED_ON",
    ("Organization", "Organization", "ACQUIRED"): "ACQUIRED",
    ("Organization", "Organization", "PURCHASED"): "ACQUIRED",
    ("Person", "Organization", "FOUNDED"): "FOUNDER_OF",
    ("Person", "Organization", "STARTED"): "FOUNDER_OF",
    ("Person", "Organization", "CREATOR_OF"): "FOUNDER_OF",
    ("Person", "Organization", "WORKS_FOR"): "EMPLOYED_BY",
    ("Person", "Organization", "CEO_OF"): "CEO_OF",
    ("Organization", "Location", "HEADQUARTERED_IN"): "LOCATED_IN",
    ("Organization", "Location", "BASED_IN"): "LOCATED_IN",
    ("Person", "Location", "LIVES_IN"): "RESIDES_IN",
    ("Date", "Product", "LAUNCHED"): "LAUNCHED_ON",
    ("Date", "Product", "RELEASED"): "RELEASED_ON",
    ("Date", "Product", "INTRODUCED"): "RELEASED_ON",
    ("Event", "Date", "HAPPENED_ON"): "OCCURRED_ON",
    ("Product", "Technology", "USES"): "USES_TECHNOLOGY",
}

# --- Direction normalization (T5) -------------------------------------------
# predicate -> (expected_source_type, expected_target_type); when the observed
# (src,dst) types are exactly swapped, the edge is flipped
# (reference graph_extractor.py:181-202).

DIRECTION_SEMANTICS: dict[str, tuple[str, str]] = {
    "FOUNDED_BY": ("Organization", "Person"),
    "HAS_ROLE": ("Organization", "Person"),
    "EMPLOYS": ("Organization", "Person"),
    "WORKS_FOR": ("Person", "Organization"),
    "FOUNDED": ("Person", "Organization"),
    "HAPPENED_ON": ("Event", "Date"),
    "CREATED_ON": ("Product", "Date"),
    "LOCATED_IN": ("Organization", "Location"),
    "HEADQUARTERED_IN": ("Organization", "Location"),
}

# --- Edge classes (graph_extractor.py:479-482) ------------------------------

ATTACK_CHAIN_PREDICATES: frozenset[str] = frozenset(
    {"LEADS_TO", "FOLLOWED_BY", "RESULTS_IN"}
)
CONNECTION_PREDICATES: frozenset[str] = frozenset(
    {"SOURCE_OF", "TARGET_OF", "USED_PORT", "USED_PROTOCOL"}
)

# --- Network vocab (network_parser.py:24-53) --------------------------------

WELL_KNOWN_PORTS: dict[int, str] = {
    20: "FTP-Data", 21: "FTP", 22: "SSH", 23: "Telnet", 25: "SMTP",
    53: "DNS", 67: "DHCP", 68: "DHCP", 80: "HTTP", 110: "POP3",
    143: "IMAP", 443: "HTTPS", 445: "SMB", 993: "IMAPS", 995: "POP3S",
    1433: "MSSQL", 1521: "Oracle", 3306: "MySQL", 3389: "RDP",
    5432: "PostgreSQL", 5900: "VNC", 6379: "Redis", 8080: "HTTP-Alt",
    8443: "HTTPS-Alt", 27017: "MongoDB",
}

SUSPICIOUS_PORTS: tuple[int, ...] = (4444, 5555, 6666, 7777, 31337, 12345, 54321, 1234)

# port -> description (graph_anomaly_detector.py:292-301)
SUSPICIOUS_PORT_DESCRIPTIONS: dict[int, str] = {
    4444: "Metasploit default", 5555: "Android ADB", 6666: "IRC backdoor",
    31337: "Elite/Back Orifice", 12345: "NetBus", 27374: "Sub7",
    1234: "Generic backdoor", 4321: "Generic backdoor",
}

# suspicious protocols for rarity detection (graph_anomaly_detector.py:262)
SUSPICIOUS_PROTOCOLS: frozenset[str] = frozenset({"icmp", "gre", "ipip", "esp", "ah"})

# service -> port lookup for IP-less ingest (auto_processor.py:373-377)
SERVICE_PORTS: dict[str, int] = {
    "http": 80, "https": 443, "ftp": 21, "ssh": 22, "dns": 53,
    "smtp": 25, "pop3": 110, "imap": 143, "snmp": 161, "dhcp": 67,
}

# column-name aliases for generic CSV ingestion (auto_processor.py:480-519)
COLUMN_ALIASES: dict[str, tuple[str, ...]] = {
    "source_ip": ("source_ip", "src_ip", "srcip", "src", "source"),
    "dest_ip": ("dest_ip", "dst_ip", "dstip", "dst", "destination_ip", "destination"),
    "source_port": ("source_port", "src_port", "sport", "sourceport"),
    "dest_port": ("dest_port", "dst_port", "dsport", "dport", "destination_port"),
    "protocol": ("protocol", "proto"),
    "bytes_sent": ("bytes_sent", "sbytes", "bytes", "bytes_out"),
    "bytes_received": ("bytes_received", "dbytes", "bytes_in"),
    "duration": ("duration", "dur"),
    "timestamp": ("timestamp", "time", "ts", "stime", "datetime"),
    "action": ("action", "state"),
    "attack_type": ("attack_type", "attack_cat", "label_cat", "category"),
}


# Types whose surface forms may be fuzzily linked (MinHash-LSH / embedding
# similarity) during canonicalization. Everything else resolves ONLY by exact
# normalize_key: near-identical surfaces of these types denote DISTINCT
# entities (192.168.1.10 vs .11, CVE-2023-10001 vs 10002, Widget 1000 vs 1001,
# January 1, 2015 vs January 8, 2016) — the reference is explicit that IPs
# match by exact label (graph_merger.py:26-28).
FUZZY_LINKABLE_TYPES: frozenset[str] = frozenset(
    {"Person", "Organization", "Location", "Device", "Event", "Technology",
     "Document", "Concept"}
)
