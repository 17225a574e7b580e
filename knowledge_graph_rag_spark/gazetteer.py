"""Deterministic gazetteer: entity surface forms + relation surface forms.

The reference extracts typed entities / (subj, pred, obj) triples with an LLM
constrained to a closed vocabulary (``graph_extractor.py:205-377``). The LLM's
nondeterminism is not part of the correctness contract (its tests never assert
LLM output — SURVEY.md §5), so this engine fixes a *deterministic* rule set:
dictionary-gazetteer mention detection + adjacency-pattern triple emission.
The same gazetteer drives

- corpus synthesis (synth.py — sentences are built from these surfaces),
- the vectorized Spark extractor (operators/extract.py),
- the single-threaded pandas oracle (oracle.py) that defines the
  "reference emitted set" for P/R scoring.

All pools are plain tuples: deterministic, importable on executors, and tiny
enough to ship inside the closure of a pandas UDF / broadcast join.
"""

from __future__ import annotations

from .vocab import entity_class_of

# --- Entity pools: (canonical_label, type, (surface forms...)) --------------
# First surface is the canonical one; extra surfaces are aliases that the
# entity-linking stage (operators/link.py, reference graph_merger.py:204-240)
# must resolve to the same canonical entity.

_FIRST = ("Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
          "Irene", "Jack", "Karen", "Leo", "Mona", "Nate", "Olga", "Paul",
          "Quinn", "Rosa", "Sam", "Tina")
_LAST = ("Johnson", "Smith", "Nguyen", "Garcia", "Okafor", "Petrov",
         "Tanaka", "Muller", "Rossi", "Chen")

PERSONS: tuple[tuple[str, str, tuple[str, ...]], ...] = tuple(
    (f"{_FIRST[i]} {_LAST[i % 10]}", "Person", (f"{_FIRST[i]} {_LAST[i % 10]}",))
    for i in range(20)
)

_ORG_STEMS = ("Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
              "Hooli", "Vandelay", "Cyberdyne", "Tyrell", "Wonka", "Oscorp",
              "Aperture", "BlueSun", "Massive", "Soylent", "Virtucon",
              "Zorg", "Nakatomi", "Gringotts", "Duff", "Sirius", "Monarch",
              "Helix")

ORGANIZATIONS: tuple[tuple[str, str, tuple[str, ...]], ...] = tuple(
    (
        f"{stem} Corp",
        "Organization",
        # every third org gets alias surfaces to exercise linking
        (f"{stem} Corp", f"{stem} Corporation", stem.upper())
        if i % 3 == 0
        else (f"{stem} Corp",),
    )
    for i, stem in enumerate(_ORG_STEMS)
)

_CITIES = ("Springfield", "Rivertown", "Lakeside", "Hillview", "Brookfield",
           "Maplewood", "Cedar Falls", "Ironville", "Port Haven", "Stonebridge",
           "Fairmont", "Westmere", "Northgate", "Eastwick", "Southmoor",
           "Greendale")
LOCATIONS = tuple((c, "Location", (c,)) for c in _CITIES)

_PRODUCT_STEMS = ("Widget", "Gadget", "Gizmo", "Doohickey", "Contraption",
                  "Apparatus", "Device", "Module", "Unit", "Fixture",
                  "Instrument", "Appliance")
PRODUCTS = tuple(
    (f"{s} {1000 + i}", "Product", (f"{s} {1000 + i}",))
    for i, s in enumerate(_PRODUCT_STEMS)
)

_TECH = ("Kubernetes", "PostgreSQL", "GraphQL", "WebAssembly", "TensorFlow",
         "Redis Streams", "Apache Kafka", "gRPC", "OAuth2", "IPv6")
TECHNOLOGIES = tuple((t, "Technology", (t,)) for t in _TECH)

_EVENTS = ("DefCon Summit", "Budget Review", "Product Launch Gala",
           "Merger Announcement", "Security Audit", "Annual Retreat",
           "Incident Response Drill", "Board Meeting")
EVENTS = tuple((e, "Event", (e,)) for e in _EVENTS)

_MONTHS = ("January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December")
DATES = tuple(
    (f"{_MONTHS[i % 12]} {1 + (i * 7) % 28}, {2015 + i % 10}", "Date",
     (f"{_MONTHS[i % 12]} {1 + (i * 7) % 28}, {2015 + i % 10}",))
    for i in range(24)
)

INTERNAL_IPS = tuple(
    (ip, "InternalIP", (ip,))
    for ip in (
        [f"192.168.1.{10 + i}" for i in range(12)]
        + [f"10.0.0.{5 + i}" for i in range(8)]
    )
)

EXTERNAL_IPS = tuple(
    (ip, "ExternalIP", (ip,))
    for ip in (
        [f"203.0.113.{7 + i}" for i in range(10)]
        + [f"198.51.100.{3 + i}" for i in range(10)]
    )
)

# Devices: "Workstation WS-n" aliases to "WS-n" (graph_merger.py:234-237)
DEVICES = tuple(
    (f"Workstation WS-{i}", "Device", (f"Workstation WS-{i}", f"WS-{i}"))
    if i % 2 == 0
    else (f"Server SRV-{i}", "Device", (f"Server SRV-{i}", f"SRV-{i}"))
    for i in range(1, 13)
)

_DOMAINS = tuple(f"svc{i}.example-{chr(97 + i % 5)}.com" for i in range(10))
DOMAINS = tuple((d, "Domain", (d,)) for d in _DOMAINS)

PORT_ENTITIES = tuple(
    (f"port {p}", "Port", (f"port {p}",))
    for p in (22, 80, 443, 3389, 4444, 5555, 6666, 31337, 8080, 3306)
)

PROTOCOL_ENTITIES = tuple(
    (f"{p} protocol", "Protocol", (f"{p} protocol",)) for p in ("TCP", "UDP", "ICMP", "GRE")
)

_ATTACKS = ("Operation Red Phish", "DDoS Barrage", "SQLi Blitz",
            "Brute Force Wave", "Ransom Lockdown", "Zero Day Strike",
            "Credential Harvest", "Supply Chain Graft")
ATTACKS = tuple((a, "Attack", (a,)) for a in _ATTACKS)

VULNERABILITIES = tuple(
    (f"CVE-2023-{10001 + i}", "Vulnerability", (f"CVE-2023-{10001 + i}",))
    for i in range(8)
)

_THREATS = ("Shadow Serpent", "Crimson Fox", "Silent Mantis",
            "Iron Jackal", "Ghost Lynx", "Static Viper")
THREATS = tuple((t, "Threat", (t,)) for t in _THREATS)

_INDICATORS = tuple(f"ioc-hash-{i:04d}" for i in range(6))
INDICATORS = tuple((x, "Indicator", (x,)) for x in _INDICATORS)

STAGE_ENTITIES: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    ("Initial Foothold Alpha", "InitialAccess", ("Initial Foothold Alpha",)),
    ("Payload Run Beta", "Execution", ("Payload Run Beta",)),
    ("Registry Implant Gamma", "Persistence", ("Registry Implant Gamma",)),
    ("Privilege Jump Delta", "PrivilegeEscalation", ("Privilege Jump Delta",)),
    ("Credential Dump Epsilon", "CredentialAccess", ("Credential Dump Epsilon",)),
    ("Lateral Hop Zeta", "LateralMovement", ("Lateral Hop Zeta",)),
    ("Data Staging Eta", "Collection", ("Data Staging Eta",)),
    ("Exfil Stream Theta", "Exfiltration", ("Exfil Stream Theta",)),
    ("C2 Beacon Iota", "CommandAndControl", ("C2 Beacon Iota",)),
)

ALL_ENTITIES: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    PERSONS + ORGANIZATIONS + LOCATIONS + PRODUCTS + TECHNOLOGIES + EVENTS
    + DATES + INTERNAL_IPS + EXTERNAL_IPS + DEVICES + DOMAINS + PORT_ENTITIES
    + PROTOCOL_ENTITIES + ATTACKS + VULNERABILITIES + THREATS + INDICATORS
    + STAGE_ENTITIES
)

# Pools by type for the synthesizer's typed sampling.
ENTITIES_BY_TYPE: dict[str, tuple[tuple[str, str, tuple[str, ...]], ...]] = {}
for _ent in ALL_ENTITIES:
    ENTITIES_BY_TYPE.setdefault(_ent[1], ())
for _ent in ALL_ENTITIES:
    ENTITIES_BY_TYPE[_ent[1]] = ENTITIES_BY_TYPE[_ent[1]] + (_ent,)


def surface_to_entity() -> dict[str, tuple[str, str]]:
    """surface form -> (canonical_label, type). The alias dictionary of J3."""
    out: dict[str, tuple[str, str]] = {}
    for label, etype, surfaces in ALL_ENTITIES:
        for s in surfaces:
            out[s] = (label, etype)
    return out


def alias_rows() -> list[tuple[str, str, str, str]]:
    """(surface, canonical_label, type, entity_class) rows for the broadcast
    alias-dictionary DataFrame."""
    return [
        (s, label, etype, entity_class_of(etype))
        for label, etype, surfaces in ALL_ENTITIES
        for s in surfaces
    ]


# --- Relation surface forms --------------------------------------------------
# (subj_type, obj_type, surface, raw_predicate). ``raw_predicate`` is what the
# extractor emits before canonical-predicate rewriting (T4) and direction
# normalization (T5). Patterns marked reversed=True are rendered by synth.py
# with the *object-type entity first* in the sentence, so the raw edge comes
# out backwards and T5 must flip it (graph_extractor.py:171-202).

RELATION_PATTERNS: tuple[tuple[str, str, str, str], ...] = (
    # general — several feed the SEMANTIC_RELATIONSHIP_MAP rewrites
    ("Person", "Organization", "works for", "WORKS_FOR"),          # -> EMPLOYED_BY
    ("Person", "Organization", "founded", "FOUNDED"),              # -> FOUNDER_OF
    ("Person", "Organization", "is the CEO of", "CEO_OF"),         # -> CEO_OF
    ("Person", "Location", "lives in", "LIVES_IN"),                # -> RESIDES_IN
    ("Person", "Person", "knows", "KNOWS"),
    ("Organization", "Location", "is headquartered in", "HEADQUARTERED_IN"),  # -> LOCATED_IN
    ("Organization", "Location", "is based in", "BASED_IN"),       # -> LOCATED_IN
    ("Organization", "Organization", "acquired", "ACQUIRED"),
    ("Organization", "Organization", "purchased", "PURCHASED"),    # -> ACQUIRED
    ("Organization", "Product", "owns", "OWNS"),
    ("Date", "Organization", "saw the creation of", "CREATED"),    # -> FOUNDED_ON
    ("Date", "Organization", "marked the purchase of", "PURCHASED"),  # -> ACQUIRED_ON
    ("Date", "Product", "saw the launch of", "LAUNCHED"),          # -> LAUNCHED_ON
    ("Date", "Product", "saw the release of", "RELEASED"),         # -> RELEASED_ON
    ("Event", "Date", "happened on", "HAPPENED_ON"),               # -> OCCURRED_ON
    ("Product", "Technology", "uses", "USES"),                     # -> USES_TECHNOLOGY
    ("Person", "Event", "took part in", "INVOLVED_IN"),
    # network security
    ("ExternalIP", "InternalIP", "scanned", "SCANNED"),
    ("ExternalIP", "InternalIP", "attacked", "ATTACKED"),
    ("InternalIP", "ExternalIP", "transferred data to", "TRANSFERRED_TO"),
    ("InternalIP", "InternalIP", "connected to", "CONNECTED_TO"),
    ("Device", "Port", "listens on", "USES_PORT"),
    ("Domain", "ExternalIP", "resolves to", "RESOLVES_TO"),
    ("Person", "Device", "logged in to", "LOGGED_IN"),
    ("Device", "Protocol", "communicates via", "USED_PROTOCOL"),
    # attack chain / evidence
    ("Attack", "Vulnerability", "exploits", "EXPLOITS"),
    ("Attack", "InternalIP", "targets", "TARGETS"),
    ("InitialAccess", "Execution", "leads to", "LEADS_TO"),
    ("Execution", "Persistence", "leads to", "LEADS_TO"),
    ("CredentialAccess", "LateralMovement", "leads to", "LEADS_TO"),
    ("Collection", "Exfiltration", "leads to", "LEADS_TO"),
    ("LateralMovement", "Collection", "is followed by", "FOLLOWED_BY"),
    ("Attack", "Exfiltration", "results in", "RESULTS_IN"),
    ("Indicator", "Threat", "indicates", "INDICATES"),
    ("Threat", "Attack", "is linked to", "ATTRIBUTED_TO"),
    ("Attack", "Indicator", "is supported by", "SUPPORTED_BY"),
)

# Patterns rendered object-first to exercise T5 direction flipping.  The
# sentence "<Org-entity> <surface> <Person-entity>" yields a raw edge
# (Org)-[WORKS_FOR]->(Person), which T5 reverses.
REVERSED_RELATION_PATTERNS: tuple[tuple[str, str, str, str], ...] = (
    ("Organization", "Person", "works for", "WORKS_FOR"),
    ("Organization", "Person", "founded", "FOUNDED"),
    ("Location", "Organization", "is headquartered in", "HEADQUARTERED_IN"),
    ("Date", "Event", "happened on", "HAPPENED_ON"),
)

ALL_RELATION_SURFACES: tuple[tuple[str, str], ...] = tuple(
    sorted(
        {(surface, pred) for _, _, surface, pred in RELATION_PATTERNS}
        | {(surface, pred) for _, _, surface, pred in REVERSED_RELATION_PATTERNS},
        key=lambda sp: (-len(sp[0]), sp[0]),
    )
)


def relation_surface_map() -> dict[str, str]:
    """relation surface -> raw predicate (longest-first ordering preserved
    by ALL_RELATION_SURFACES for greedy matching)."""
    return dict(ALL_RELATION_SURFACES)
