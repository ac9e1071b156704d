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

from .hashing import crc32_str, xxh64

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


def addr_key_of(domain: Column) -> Column:
    """base64 of the 4 octets of the /24-masked synthetic IP
    (types.rs:42-55; mask 0xffffff00 per conf/default.yaml:54)."""
    masked = synth_ip32_of(domain).bitwiseAND(F.lit(0xFFFFFF00))
    key = F.base64(F.unhex(F.lpad(F.hex(masked), 8, "0")))
    # xxhash64(NULL) yields the seed, which would silently herd every
    # malformed URL into one politeness bucket — keep NULL domains NULL.
    return F.when(domain.isNotNull(), key)


def shard_of_col(addr_key: Column, shard_total: int = DEFAULT_SHARD_TOTAL) -> Column:
    return F.pmod(F.crc32(addr_key.cast("binary")), F.lit(shard_total)).cast("int")


def with_frontier_identity(df, url_col: str = "url", shard_total: int = DEFAULT_SHARD_TOTAL):
    """url -> + (url_hash, domain, tld, addr_key, shard). One projection,
    all JVM-side; Catalyst folds the shared subexpressions."""
    u = F.col(url_col)
    domain = strip_www(host_of(u))
    return (
        df.withColumn("url_hash", url_hash_of(u))
        .withColumn("domain", domain)
        .withColumn("tld", tld_of(F.col("domain")))
        .withColumn("addr_key", addr_key_of(F.col("domain")))
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
    # collapse /./ and leading ../ noise, then /seg/../ pairs (bounded passes)
    for _ in range(8):
        new = out.str.replace(r"/\.(?=/|$)", "", regex=True)
        new = new.str.replace(r"/(?!\.\.(?:/|$))[^/]+/\.\.(?=/|$)", "", regex=True)
        if new.equals(out):
            out = new
            break
        out = new
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


def py_synth_ip32(domain: str) -> int:
    return xxh64(domain.encode("utf-8")) & 0xFFFFFFFF


def py_addr_key_of(domain: str) -> str:
    masked = py_synth_ip32(domain) & 0xFFFFFF00
    return base64.b64encode(masked.to_bytes(4, "big")).decode("ascii")


def py_shard_of(addr_key: str, shard_total: int = DEFAULT_SHARD_TOTAL) -> int:
    return crc32_str(addr_key) % shard_total
