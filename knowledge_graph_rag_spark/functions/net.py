"""Network scalar functions as native Column expressions.

Reference semantics (SURVEY.md §2.2): ``network_parser.py:16-72`` internal-IP
classification, port→service lookup, suspicious-port predicate; natural-key
node ids ``network_parser.py:205,217`` / ``auto_processor.py:762``; the
entity-resolution normalize_key of ``graph_merger.py:204-240``. Everything is
JVM-side (whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..vocab import SUSPICIOUS_PORTS, WELL_KNOWN_PORTS

_IP_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def looks_like_ip(col: Column) -> Column:
    """4 dot-separated octets 0-255 (auto_processor.py:106-115)."""
    octets = F.split(col, r"\.")
    in_range = F.forall(
        F.transform(octets, lambda o: o.try_cast("int")),
        lambda v: v.isNotNull() & (v >= 0) & (v <= 255),
    )
    return col.rlike(_IP_RE) & in_range


def is_internal_ip(col: Column) -> Column:
    """RFC1918 + loopback membership (network_parser.py:16-21,56-62) via
    octet math — 10/8, 172.16/12, 192.168/16, 127/8."""
    o = F.split(col, r"\.")
    o1 = F.get(o, 0).try_cast("int")
    o2 = F.get(o, 1).try_cast("int")
    return looks_like_ip(col) & (
        (o1 == 10)
        | (o1 == 127)
        | ((o1 == 172) & (o2 >= 16) & (o2 <= 31))
        | ((o1 == 192) & (o2 == 168))
    )


def service_name(port: Column) -> Column:
    """Port → service with ``Port-{n}`` default (network_parser.py:24-50,65-67).
    25-entry lookup folded into a when-chain (constant-folded by Catalyst)."""
    chain = reduce(
        lambda acc, kv: acc.when(port == kv[0], F.lit(kv[1])),
        WELL_KNOWN_PORTS.items(),
        F.when(F.lit(False), F.lit("")),
    )
    return chain.otherwise(F.concat(F.lit("Port-"), port.cast("string")))


def is_suspicious_port(port: Column) -> Column:
    """Blocklist OR ephemeral >49152 excl. 49152/3 (network_parser.py:53,70-72)."""
    return port.isin(*SUSPICIOUS_PORTS) | (
        (port > 49152) & ~port.isin(49152, 49153)
    )


# --- natural-key node ids -----------------------------------------------------


def ip_node_id(ip: Column) -> Column:
    """`ip_{ip dots→underscores}` (network_parser.py:205)."""
    return F.concat(F.lit("ip_"), F.regexp_replace(ip, r"\.", "_"))


def port_node_id(port: Column) -> Column:
    """`port_{n}` (network_parser.py:217)."""
    return F.concat(F.lit("port_"), port.cast("string"))


def attack_node_id(name: Column) -> Column:
    """`attack_{name lowercased, spaces→_}` (auto_processor.py:762)."""
    return F.concat(F.lit("attack_"), F.lower(F.regexp_replace(name, r"\s+", "_")))


# --- entity-resolution link key (J3, graph_merger.py:204-240) -----------------


def normalize_key(label: Column, node_type: Column) -> Column:
    """Per-type canonical key: ip:<label> / port:<digits> / protocol:<UPPER> /
    device:<stripped lower> / default <type_lower>:<label_lower>."""
    label_s = F.trim(label)
    device_norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(label_s), "workstation", ""), "server", ""
        )
    )
    port_digits = F.regexp_extract(label_s, r"(\d+)", 1)
    return (
        F.when(
            node_type.isin("InternalIP", "ExternalIP", "IPAddress"),
            F.concat(F.lit("ip:"), label_s),
        )
        .when(
            node_type == "Port",
            F.concat(
                F.lit("port:"),
                F.when(port_digits != "", port_digits).otherwise(F.lower(label_s)),
            ),
        )
        .when(node_type == "Protocol", F.concat(F.lit("protocol:"), F.upper(label_s)))
        .when(node_type == "Device", F.concat(F.lit("device:"), device_norm))
        .otherwise(F.concat(F.lower(node_type), F.lit(":"), F.lower(label_s)))
    )


def entity_node_id(label: Column, node_type: Column) -> Column:
    """Deterministic node id from the normalize_key — natural keys for
    telemetry types (parity with the reference's network path), content hash
    for semantic/security entities (replacing the reference's UUID minting
    with something stable and distributed-friendly)."""
    key = normalize_key(label, node_type)
    return (
        F.when(
            node_type.isin("InternalIP", "ExternalIP", "IPAddress"),
            ip_node_id(F.trim(label)),
        )
        .when(node_type == "Port", F.concat(F.lit("port_"), F.regexp_extract(F.trim(label), r"(\d+)", 1)))
        .when(node_type.isin("Attack", "AttackType"), attack_node_id(F.trim(label)))
        .otherwise(F.concat(F.lit("ent_"), F.substring(F.sha2(key, 256), 1, 16)))
    )
