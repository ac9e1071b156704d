"""Config loading with the reference's layering semantics
(workspace/main/src/config.rs:248-292):

1. read the base config file, expanding ``{VAR}`` placeholders
   (GIT_SHA / BUILD_TIMESTAMP — config.rs:248-257);
2. overlay ``profile-{CRUSTY_PROFILE}`` when that env var is set
   (required, config.rs:265-267);
3. overlay ``local`` when present (optional, config.rs:270);
4. apply ``APP_``-prefixed environment overrides (config.rs:272);
5. extend the seed list from ``CRUSTY_SEEDS`` (comma-separated,
   config.rs:286-288).

The reference uses YAML; this sandbox has no YAML parser baked in, so
files are JSON with identical layering. Unknown keys are rejected
(serde ``deny_unknown_fields`` analog).
"""

from __future__ import annotations

import dataclasses
import json
import os

from .frontier import CrawlConfig


def expand_vars(text: str, replacements: dict[str, str] | None = None) -> str:
    """Replace ``{VAR}`` placeholders (config.rs:248-257). Build metadata
    comes from the environment here (no compile-time vergen)."""
    repl = {
        "GIT_SHA": os.environ.get("GIT_SHA", "unknown"),
        "BUILD_TIMESTAMP": os.environ.get("BUILD_TIMESTAMP", "unknown"),
    }
    if replacements:
        repl.update(replacements)
    for var, val in repl.items():
        text = text.replace("{" + var + "}", val)
    return text


def _coerce(raw: str, default):
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    if isinstance(default, float):
        return float(raw)
    return raw


def load_config(
    conf_dir: str | None = None, env: dict[str, str] | None = None
) -> tuple[CrawlConfig, list[str]]:
    """-> (CrawlConfig, seed URLs) after the full layering above."""
    env = dict(os.environ) if env is None else env
    fields = {f.name: f for f in dataclasses.fields(CrawlConfig)}
    defaults = CrawlConfig()
    data: dict = {}
    seeds: list[str] = []

    def merge_file(path: str, required: bool) -> None:
        if not os.path.exists(path):
            if required:
                raise FileNotFoundError(path)
            return
        with open(path) as f:
            doc = json.loads(expand_vars(f.read()))
        # overlay semantics match the reference's config-crate merge:
        # a later layer's `seeds` REPLACES the accumulated list (the
        # config crate overwrites values on merge); only the
        # CRUSTY_SEEDS env extension below is additive (config.rs:286-288)
        if "seeds" in doc:
            seeds[:] = doc.pop("seeds")
        unknown = set(doc) - set(fields)
        if unknown:  # deny_unknown_fields analog
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        data.update(doc)

    if conf_dir is not None:
        merge_file(os.path.join(conf_dir, "default.json"), required=True)
        profile = env.get("CRUSTY_PROFILE", "")
        if profile:
            merge_file(os.path.join(conf_dir, f"profile-{profile}.json"), required=True)
        merge_file(os.path.join(conf_dir, "local.json"), required=False)

    for name, f in fields.items():
        raw = env.get("APP_" + name.upper())
        if raw is not None:
            data[name] = _coerce(raw, getattr(defaults, name))

    raw_seeds = env.get("CRUSTY_SEEDS", "")
    if raw_seeds:
        seeds.extend(v for v in raw_seeds.split(",") if v)

    return CrawlConfig(**data), seeds
