"""Custom check registry + config file round-trip (§2.9 extension surface)."""

import pyarrow as pa
import pytest

from fastpasta_ray.checks.registry import (
    generate_template,
    get_check,
    load_config,
    register_check,
    registered,
    save_config,
)
from fastpasta_ray.pipelines.check import run_check
from fastpasta_ray.stages.validate import CheckConfig
from fastpasta_ray.synth import SynthSpec, write_fixture


def test_config_roundtrip(tmp_path):
    p = str(tmp_path / "cfg.json")
    cfg = CheckConfig(
        vocab=1000,
        enabled_codes=("E10", "E70"),
        bos_id=1,
        extra={"custom_checks": ["max_len"], "max_len": 64},
    )
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg


def test_generate_template(tmp_path):
    p = str(tmp_path / "template.json")
    generate_template(p)
    assert load_config(p) == CheckConfig()


def test_config_roundtrip_toml(tmp_path):
    """TOML config round-trip (--checks-toml analog,
    custom_checks_cfg.rs:7-28): save → load == original, None fields
    omitted by TOML load back as dataclass defaults."""
    p = str(tmp_path / "cfg.toml")
    cfg = CheckConfig(
        vocab=1000,
        enabled_codes=("E10", "E70"),
        bos_id=1,
        extra={"custom_checks": ["max_len"], "max_len": 64},
    )
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2 == cfg
    # unknown fields fail loudly (serde deny_unknown_fields analog);
    # prepended so it is a top-level key, not an [extra] entry
    with open(p) as f:
        body = f.read()
    with open(p, "w") as f:
        f.write("not_a_field = 3\n" + body)
    with pytest.raises(ValueError, match="unknown field"):
        load_config(p)


def test_generate_template_toml_cli_roundtrip(tmp_path, capsys):
    """CLI: generate-config → hand-edit → check --checks-config picks the
    edited TOML up (generate + edit + load, config.rs:383-447 analog)."""
    from fastpasta_ray import cli

    p = str(tmp_path / "template.toml")
    assert cli.main(["generate-config", p]) == 0
    cfg = load_config(p)
    assert cfg == CheckConfig()
    # hand-edit: tighten the vocab bound
    text = open(p).read().replace("vocab = 50304", "vocab = 77")
    with open(p, "w") as f:
        f.write(text)
    assert load_config(p).vocab == 77


def test_registry_unknown_check():
    with pytest.raises(KeyError, match="unknown custom check"):
        get_check("nope")
    assert "max_len" in registered()


def test_custom_check_end_to_end(tmp_path):
    d = str(tmp_path / "fix")
    write_fixture(d, SynthSpec(n_rows=300, n_parts=2, mean_n_tok=64), manifest=False)
    cap = 128
    res = run_check(
        d,
        cfg=CheckConfig(extra={"custom_checks": ["max_len"], "max_len": cap}),
        with_key_checks=False,
    )
    v = res.violations
    long_rows = v.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(v["code"], "E9100")
    )
    assert long_rows.num_rows > 0
    assert all(
        f"exceeds max_len {cap}" in m for m in long_rows["message"].to_pylist()
    )
    # verify against ground truth: count rows with n_tok > cap
    import pyarrow.parquet as pq

    import glob as g

    total = sum(
        sum(1 for x in pq.read_table(f, columns=["n_tok"])["n_tok"].to_pylist() if x > cap)
        for f in g.glob(d + "/part-*.parquet")
    )
    assert long_rows.num_rows == total


def test_new_check_registration():
    @register_check("always_empty")
    def _check(batch: pa.Table, cfg) -> pa.Table:
        from fastpasta_ray import schema as S

        return S.VIOLATIONS_SCHEMA.empty_table()

    assert "always_empty" in registered()
    assert get_check("always_empty") is _check
