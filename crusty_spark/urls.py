"""URL canonicalization, domain/addr_key/shard derivation.

Mirrors the reference's URL handling surface:

- host extraction + domain-less skip: reference crusty.rs:498-507
- relative-href resolution against the page URL: reference
  workspace/main/src/parsers/lolhtml.rs:25-38
- SLD collapse / www-strip: reference workspace/main/src/rules.rs:28-34
- TLD = last dot-segment, uppercased: reference crusty.rs:257,
  workspace/redis-calc/src/lib.rs:38-41
- addr_key = base64(first resolved IP masked to /24): reference
  workspace/main/src/types.rs:42-55 (sandbox: the "resolved IP" is a
  pure hash of the domain — no network, same semantics: a many-to-one
  domain→/24 bucket used for politeness)
- shard = crc32(addr_key) % shard_total: types.rs:51-53

Everything here is either a JVM Column expression (fast path) or a
vectorized pandas transform (canonicalize_series — pandas str ops on
whole Arrow batches, never per-row Python). The pure-Python twins at
the bottom feed the reference simulator and property tests.
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import crc32_str, spark_xxhash64_str, xxh64

DEFAULT_SHARD_TOTAL = 16

# ---------------------------------------------------------------------
# Column-expression layer (JVM-side, codegen'd)
# ---------------------------------------------------------------------


def host_of(url: Column) -> Column:
    """Lowercased host; NULL for scheme-less/host-less URLs
    (reference skips those seeds, crusty.rs:498-507)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def strip_www(domain: Column) -> Column:
    """rules.rs:28-34 (second_level_only=false branch): strip one www. prefix."""
    return F.regexp_replace(domain, r"^www\.", "")


def sld_of(domain: Column) -> Column:
    """Collapse to second-level domain: last two dot-segments
    (rules.rs:28-33, second_level_only=true branch)."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(domain)


def transform_domain(domain: Column, second_level_only: bool) -> Column:
    """JobState::transform_domain (rules.rs:28-34): linked-domain names
    collapse to the SLD under `second_level_only`, otherwise only a
    leading www. is stripped. Applied to BOTH the job's own domain and
    every linked domain before self-link comparison (rules.rs:36-43)."""
    return sld_of(domain) if second_level_only else strip_www(domain)


def tld_of(domain: Column) -> Column:
    """Uppercased last dot-segment (crusty.rs:257)."""
    return F.upper(F.element_at(F.split(domain, r"\."), -1))


def url_hash_of(url: Column) -> Column:
    """The engine's canonical 64-bit URL id (input_hint)."""
    return F.xxhash64(url)


def synth_ip32_of(domain: Column) -> Column:
    """Deterministic fake 'resolved IPv4' as an unsigned 32-bit int in a
    long column: low 32 bits of xxhash64(domain). Stands in for DNS
    (crusty.rs:405-432) — a pure function domain -> address."""
    h = F.xxhash64(domain)
    return F.shiftrightunsigned(F.shiftleft(h, 32), 32)  # low 32 bits, zero-extended


def _v4_mask_int(bits: int) -> int:
    """/bits prefix mask as a u32 (types.rs:45-46 Ipv4Network masking)."""
    if not 0 < bits <= 32:
        raise ValueError(f"addr_key_v4_mask must be in 1..32, got {bits}")
    return (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF


def _v6_mask_int(bits: int) -> int:
    """/bits prefix mask over the synthetic v6 /64 prefix, as a SIGNED
    i64 (Spark long). The engine's synthetic v6 address is the top 64
    bits of the reference's 128-bit address (types.rs:47 masks the full
    address; any mask <= 64 is expressible here — the reference default
    is 24, conf/default.yaml:55)."""
    if not 0 < bits <= 64:
        raise ValueError(f"addr_key_v6_mask must be in 1..64, got {bits}")
    u = ((1 << 64) - 1) ^ ((1 << (64 - bits)) - 1)
    return u - (1 << 64) if u >= (1 << 63) else u


def addr_key_of(domain: Column, v4_mask: int = 24) -> Column:
    """base64 of the 4 octets of the /v4_mask-masked synthetic IP
    (types.rs:42-55; addr_key_v4_mask per conf/default.yaml:54 — /24
    default: first 24 bits significant, last 8 masked)."""
    masked = synth_ip32_of(domain).bitwiseAND(F.lit(_v4_mask_int(v4_mask)))
    key = F.base64(F.unhex(F.lpad(F.hex(masked), 8, "0")))
    # xxhash64(NULL) yields the seed, which would silently herd every
    # malformed URL into one politeness bucket — keep NULL domains NULL.
    return F.when(domain.isNotNull(), key)


# --- O1: multi-address selection + IPv6 policy (types.rs:22-40) -------
#
# The reference resolves a domain to a LIST of addresses, sorts v4 and
# v6 separately, and picks one per resolver.addr_ipv6_policy
# (config.rs:227-231): Disabled -> first v4; Preferred -> first v6 else
# first v4; Fallback -> first v4 else first v6. No address -> the
# domain is dropped. Our DNS stand-in synthesizes the list from domain
# hashes: 0-2 v4s (6% have none) and a v6 for ~25% of domains.
# "v4_single" is the legacy identity (exactly one v4 = low32(h(domain)))
# kept as the default so existing addr_keys stay stable.

ADDR_POLICIES = ("v4_single", "disabled", "preferred", "fallback")


def _low32(c: Column) -> Column:
    return F.shiftrightunsigned(F.shiftleft(c, 32), 32)


def synth_addrs(domain: Column) -> Column:
    """domain -> struct(v4s: sorted array<long>, v6: nullable long).
    v4s are u32s in a long; v6 is the /64 prefix as a signed long."""
    h0 = F.xxhash64(F.concat(domain, F.lit(":addrs")))
    n_v4 = F.when(F.pmod(h0, F.lit(16)) == 0, F.lit(0)).otherwise(
        F.lit(1) + F.pmod(F.shiftrightunsigned(h0, 4), F.lit(2)).cast("int")
    )
    v4_0 = _low32(F.xxhash64(F.concat(domain, F.lit(":v4:0"))))
    v4_1 = _low32(F.xxhash64(F.concat(domain, F.lit(":v4:1"))))
    v4s = (
        F.when(n_v4 == 0, F.array().cast("array<long>"))
        .when(n_v4 == 1, F.array(v4_0))
        .otherwise(F.sort_array(F.array(v4_0, v4_1)))
    )
    has_v6 = F.pmod(F.shiftrightunsigned(h0, 8), F.lit(4)) == 0
    v6 = F.when(has_v6, F.xxhash64(F.concat(domain, F.lit(":v6"))))
    return F.struct(v4s.alias("v4s"), v6.alias("v6"))


def addr_key_policy(
    domain: Column,
    policy: str = "v4_single",
    v4_mask: int = 24,
    v6_mask: int = 64,
) -> Column:
    """addr_key under an address-selection policy. v4 keys are base64 of
    the 4 masked octets (legacy format); v6 keys are base64 of the
    masked 8-byte /64 prefix — different lengths, so the key spaces
    never collide. Masks are the configurable addr_key_v4_mask /
    addr_key_v6_mask (conf/default.yaml:54-55, applied at
    types.rs:45-47); the engine's v6 default of 64 keeps legacy keys
    stable — reference_config carries the reference's 24. NULL when the
    policy selects no address (domain dropped, types.rs:57-60)."""
    if policy == "v4_single":
        return addr_key_of(domain, v4_mask)
    if policy not in ADDR_POLICIES:
        raise ValueError(f"unknown addr policy {policy!r}")
    a = synth_addrs(domain)
    v4_first = F.when(F.size(a["v4s"]) > 0, F.element_at(a["v4s"], 1))
    v6 = a["v6"]
    if policy == "disabled":
        sel_v4, sel_v6 = v4_first, F.lit(None).cast("long")
    elif policy == "preferred":
        sel_v4 = F.when(v6.isNull(), v4_first)
        sel_v6 = v6
    else:  # fallback
        sel_v4 = v4_first
        sel_v6 = F.when(v4_first.isNull(), v6)
    v4_key = F.base64(
        F.unhex(F.lpad(F.hex(sel_v4.bitwiseAND(F.lit(_v4_mask_int(v4_mask)))), 8, "0"))
    )
    v6_key = F.base64(
        F.unhex(F.lpad(F.hex(sel_v6.bitwiseAND(F.lit(_v6_mask_int(v6_mask)))), 16, "0"))
    )
    key = F.when(sel_v6.isNotNull(), v6_key).otherwise(v4_key)
    return F.when(domain.isNotNull(), key)


def shard_of_col(addr_key: Column, shard_total: int = DEFAULT_SHARD_TOTAL) -> Column:
    return F.pmod(F.crc32(addr_key.cast("binary")), F.lit(shard_total)).cast("int")


# --- net_v4_blacklist: resolver-level address filter ------------------
#
# The reference drops domains whose resolved address falls inside a
# configured net blacklist (reserved v4 nets; conf/default.yaml:246-247,
# types.rs:57-60, README.md:78). The sandbox DNS stand-in resolves a
# domain to synth_ip32_of(domain), so the filter is a pure column
# predicate on that v4 identity.


def parse_cidr(net: str) -> tuple[int, int]:
    """'10.0.0.0/8' -> (base_as_u32, prefix_bits). Validates octets."""
    addr, bits_s = net.split("/")
    bits = int(bits_s)
    if not 0 <= bits <= 32:
        raise ValueError(f"bad prefix length in {net!r}")
    octets = [int(o) for o in addr.split(".")]
    if len(octets) != 4 or any(not 0 <= o <= 255 for o in octets):
        raise ValueError(f"bad IPv4 address in {net!r}")
    base = (octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3]
    return base, bits


def ip_blacklisted_col(domain: Column, nets: tuple[str, ...]) -> Column:
    """True when the domain's synthesized v4 address falls inside any of
    the CIDR nets. A /0 net matches everything; an empty list nothing."""
    ip = synth_ip32_of(domain)
    cond = F.lit(False)
    for net in nets:
        base, bits = parse_cidr(net)
        if bits == 0:
            return F.lit(True)
        shift = 32 - bits
        cond = cond | (F.shiftrightunsigned(ip, shift) == F.lit(base >> shift))
    return cond


def with_frontier_identity(
    df,
    url_col: str = "url",
    shard_total: int = DEFAULT_SHARD_TOTAL,
    addr_policy: str = "v4_single",
    v4_mask: int = 24,
    v6_mask: int = 64,
):
    """url -> + (url_hash, domain, tld, addr_key, shard). One projection,
    all JVM-side; Catalyst folds the shared subexpressions. addr_key is
    NULL when `addr_policy` selects no address for the domain (the
    reference drops such domains, types.rs:57-60)."""
    u = F.col(url_col)
    domain = strip_www(host_of(u))
    return (
        df.withColumn("url_hash", url_hash_of(u))
        .withColumn("domain", domain)
        .withColumn("tld", tld_of(F.col("domain")))
        .withColumn(
            "addr_key", addr_key_policy(F.col("domain"), addr_policy, v4_mask, v6_mask)
        )
        .withColumn("shard", shard_of_col(F.col("addr_key"), shard_total))
    )


# ---------------------------------------------------------------------
# Vectorized canonicalization (pandas str ops over Arrow batches)
# ---------------------------------------------------------------------
#
# Resolves hrefs against a base URL like the reference's link
# constructor (parsers/lolhtml.rs:25-38). Handles: absolute URLs,
# protocol-relative (//host/..), root-relative (/path), and
# relative paths; lowercases scheme+host, drops fragments, removes
# default ports, collapses dot-segments. All steps are pandas
# Series str ops applied to whole batches.

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"


def canonicalize_series(href: pd.Series, base: pd.Series) -> pd.Series:
    href = href.fillna("").str.strip()
    base = base.fillna("").astype(str)

    is_abs = href.str.match(_SCHEME_RE)
    is_proto_rel = href.str.startswith("//")
    is_root_rel = href.str.startswith("/") & ~is_proto_rel

    base_scheme = base.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.-]*):", expand=False).fillna("http")
    base_rest = base.str.replace(_SCHEME_RE, "", regex=True).str.lstrip("/")
    base_host = base_rest.str.split("/", n=1).str[0]
    base_path = "/" + base_rest.str.split("/", n=1).str[1].fillna("")
    base_dir = base_path.str.replace(r"[^/]*$", "", regex=True)

    out = href.copy()
    out = out.mask(is_proto_rel, base_scheme + ":" + href)
    out = out.mask(is_root_rel, base_scheme + "://" + base_host + href)
    rel = ~(is_abs | is_proto_rel | is_root_rel)
    out = out.mask(rel, base_scheme + "://" + base_host + base_dir + href)

    # lowercase scheme and host
    m = out.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$")
    parsed = m[0].notna()
    rebuilt = m[0].str.lower() + "://" + m[1].str.lower() + m[2].fillna("")
    out = out.mask(parsed, rebuilt)

    # drop fragment
    out = out.str.replace(r"#.*$", "", regex=True)
    # default ports
    out = out.str.replace(r"^(http://[^/:?#]*):80(?=[/?#]|$)", r"\1", regex=True)
    out = out.str.replace(r"^(https://[^/:?#]*):443(?=[/?#]|$)", r"\1", regex=True)
    # collapse /./ noise, /seg/../ pairs, and ".." climbing above the
    # root (RFC 3986 remove_dot_segments) — on the PATH only, excluding
    # both the authority (so "/host/.." can't swallow it through the
    # scheme's "//") and the query/fragment (remove_dot_segments applies
    # to the path component only; "?next=/a/../b" must pass untouched)
    m2 = out.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([^?#]*)(.*)$")
    pre, rest, tail = m2[0], m2[1].fillna(""), m2[2].fillna("")
    for _ in range(8):
        new = rest.str.replace(r"/\.(?=/|$)", "", regex=True)
        new = new.str.replace(r"/(?!\.\.(?:/|$))[^/]+/\.\.(?=/|$)", "", regex=True)
        new = new.str.replace(r"^/\.\.(?=/|$)", "", regex=True)
        if new.equals(rest):
            rest = new
            break
        rest = new
    out = out.mask(pre.notna(), pre + rest + tail)
    # ensure path present after host
    no_path = out.str.match(r"^[a-z][a-z0-9+.-]*://[^/?#]+$")
    out = out.mask(no_path, out + "/")
    return out


# ---------------------------------------------------------------------
# Pure-Python twins (simulator / property tests)
# ---------------------------------------------------------------------


def py_host_of(url: str) -> str | None:
    if "://" not in url:
        return None
    rest = url.split("://", 1)[1]
    host = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    host = host.split("@")[-1].split(":")[0].lower()
    return host or None


def py_strip_www(domain: str) -> str:
    return domain[4:] if domain.startswith("www.") else domain


def py_tld_of(domain: str) -> str:
    return domain.rsplit(".", 1)[-1].upper()


def py_sld_of(domain: str) -> str:
    parts = domain.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else domain


def py_transform_domain(domain: str, second_level_only: bool) -> str:
    """Scalar twin of transform_domain (rules.rs:28-34)."""
    return py_sld_of(domain) if second_level_only else py_strip_www(domain)


def py_synth_ip32(domain: str) -> int:
    return xxh64(domain.encode("utf-8")) & 0xFFFFFFFF


def py_addr_key_of(domain: str, v4_mask: int = 24) -> str:
    masked = py_synth_ip32(domain) & _v4_mask_int(v4_mask)
    return base64.b64encode(masked.to_bytes(4, "big")).decode("ascii")


def py_synth_addrs(domain: str) -> tuple[list[int], int | None]:
    """Scalar twin of synth_addrs -> (sorted v4 u32 list, v6 or None)."""
    m64 = (1 << 64) - 1
    h0u = spark_xxhash64_str(domain + ":addrs") & m64
    n_v4 = 0 if h0u % 16 == 0 else 1 + ((h0u >> 4) % 2)
    v4s = sorted(
        (spark_xxhash64_str(f"{domain}:v4:{i}") & 0xFFFFFFFF) for i in range(n_v4)
    )
    v6 = spark_xxhash64_str(domain + ":v6") if (h0u >> 8) % 4 == 0 else None
    return v4s, v6


def py_addr_key_policy(
    domain: str, policy: str = "v4_single", v4_mask: int = 24, v6_mask: int = 64
) -> str | None:
    """Scalar twin of addr_key_policy."""
    if policy == "v4_single":
        return py_addr_key_of(domain, v4_mask)
    v4s, v6 = py_synth_addrs(domain)
    v4 = v4s[0] if v4s else None
    if policy == "disabled":
        sel_v4, sel_v6 = v4, None
    elif policy == "preferred":
        sel_v4, sel_v6 = (None, v6) if v6 is not None else (v4, None)
    elif policy == "fallback":
        sel_v4, sel_v6 = (v4, None) if v4 is not None else (None, v6)
    else:
        raise ValueError(f"unknown addr policy {policy!r}")
    if sel_v6 is not None:
        masked6 = sel_v6 & ((1 << 64) - 1) & (_v6_mask_int(v6_mask) & ((1 << 64) - 1))
        return base64.b64encode(masked6.to_bytes(8, "big")).decode("ascii")
    if sel_v4 is not None:
        return base64.b64encode(
            (sel_v4 & _v4_mask_int(v4_mask)).to_bytes(4, "big")
        ).decode("ascii")
    return None


def py_shard_of(addr_key: str, shard_total: int = DEFAULT_SHARD_TOTAL) -> int:
    return crc32_str(addr_key) % shard_total


def py_ip_blacklisted(domain: str, nets: tuple[str, ...]) -> bool:
    """Scalar twin of ip_blacklisted_col."""
    ip = py_synth_ip32(domain)
    for net in nets:
        base, bits = parse_cidr(net)
        if bits == 0:
            return True
        shift = 32 - bits
        if (ip >> shift) == (base >> shift):
            return True
    return False
