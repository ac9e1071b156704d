"""C9: config layering parity with the reference loader
(config.rs:248-292): {VAR} expansion, profile + local overlays,
APP_ env overrides, CRUSTY_SEEDS extension, unknown-key rejection."""

from __future__ import annotations

import json

import pytest

from crusty_spark.config import expand_vars, load_config


def _write(p, doc):
    p.write_text(json.dumps(doc))


def test_expand_vars_replaces_placeholders(monkeypatch):
    monkeypatch.setenv("GIT_SHA", "abc123")
    assert expand_vars("sha={GIT_SHA} x={NOPE}") == "sha=abc123 x={NOPE}"
    assert expand_vars("{A}", {"A": "y"}) == "y"


def test_layering_default_profile_local_env(tmp_path, monkeypatch):
    _write(tmp_path / "default.json", {"max_depth": 7, "page_budget": 50,
                                       "seeds": ["http://a.com/"]})
    _write(tmp_path / "profile-prod.json", {"page_budget": 500})
    _write(tmp_path / "local.json", {"dequeue_limit": 9})
    env = {"CRUSTY_PROFILE": "prod", "APP_MAX_DEPTH": "3",
           "CRUSTY_SEEDS": "http://b.com/,http://c.com/"}
    cfg, seeds = load_config(str(tmp_path), env)
    assert cfg.page_budget == 500      # profile beats default
    assert cfg.dequeue_limit == 9      # local beats default
    assert cfg.max_depth == 3          # env beats files
    assert seeds == ["http://a.com/", "http://b.com/", "http://c.com/"]


def test_seeds_replace_across_layers(tmp_path):
    """A later layer's `seeds` REPLACES the accumulated list (the
    reference's config-crate merge overwrites values); only CRUSTY_SEEDS
    is additive (config.rs:286-288)."""
    _write(tmp_path / "default.json", {"seeds": ["http://a.com/", "http://b.com/"]})
    _write(tmp_path / "profile-prod.json", {"seeds": ["http://p.com/"]})
    cfg, seeds = load_config(str(tmp_path), {"CRUSTY_PROFILE": "prod",
                                             "CRUSTY_SEEDS": "http://e.com/"})
    assert seeds == ["http://p.com/", "http://e.com/"]


def test_missing_profile_is_an_error(tmp_path):
    _write(tmp_path / "default.json", {})
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path), {"CRUSTY_PROFILE": "nope"})


def test_unknown_keys_rejected(tmp_path):
    _write(tmp_path / "default.json", {"no_such_option": 1})
    with pytest.raises(ValueError, match="no_such_option"):
        load_config(str(tmp_path), {})


def test_reference_config_defaults():
    """reference_config(): the reference's own defaults (Fallback
    address policy, job timeouts on) for users porting a crusty config
    verbatim; overrides still apply on top."""
    from crusty_spark.frontier import CrawlConfig, reference_config

    rc = reference_config()
    assert rc.addr_ipv6_policy == "fallback"
    assert rc.job_soft_timeout_epochs == 3
    assert rc.job_hard_timeout_epochs == 5
    assert rc.job_hard_timeout_jitter_epochs == 1
    assert rc.delay_jitter == 1.0  # conf/default.yaml:203-206
    assert rc.shard_total == CrawlConfig().shard_total  # rest unchanged
    assert reference_config(page_budget=7).page_budget == 7


def test_hard_timeout_must_beat_lease_ttl():
    """A hard timeout that can't fire before the lease expires (J4)
    would be silently neutralized — the lease lapses, the domain is
    re-leased with a fresh lease_epoch and the job age resets. Such a
    config is rejected at construction."""
    from crusty_spark.frontier import CrawlConfig

    with pytest.raises(ValueError, match="lease_ttl_epochs"):
        CrawlConfig(lease_ttl_epochs=5, job_hard_timeout_epochs=5)
    with pytest.raises(ValueError, match="lease_ttl_epochs"):
        CrawlConfig(
            lease_ttl_epochs=5,
            job_hard_timeout_epochs=3,
            job_hard_timeout_jitter_epochs=2,
        )
    # boundary ok: hard + jitter == ttl - 1 can always fire first
    CrawlConfig(lease_ttl_epochs=5, job_hard_timeout_epochs=4)


def test_shard_scope_validation():
    from crusty_spark.frontier import CrawlConfig

    assert CrawlConfig(shard_total=8).shard_scope() == (0, 7)
    assert CrawlConfig(shard_total=8, shard_min=2, shard_max=5).shard_scope() == (2, 5)
    assert not CrawlConfig(shard_total=8, shard_max=3).scope_is_full()
    with pytest.raises(ValueError, match="shard scope"):
        CrawlConfig(shard_total=8, shard_min=5, shard_max=3)
    with pytest.raises(ValueError, match="shard scope"):
        CrawlConfig(shard_total=8, shard_max=8)


def test_env_only_and_bool_coercion():
    cfg, seeds = load_config(None, {"APP_SECOND_LEVEL_ONLY": "true",
                                    "APP_TOPK_DECAY": "0.5"})
    assert cfg.second_level_only is True
    assert cfg.topk_decay == 0.5
    assert seeds == []
