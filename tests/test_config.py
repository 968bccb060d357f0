"""Config layering: explicit flag > SLDI_ env > TOML > default
(≙ the reference's viper binding, cmd/root.go:47-71, and TOML loader,
internal/config.go:91-136 — including rejection of malformed config)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from main import build_parser, resolve_config  # noqa: E402


def parse(argv, toml_text=None, env=None, tmp_path=None, monkeypatch=None):
    if toml_text is not None:
        cfg = tmp_path / "cfg.toml"
        cfg.write_text(toml_text)
        argv = argv + ["--config", str(cfg)]
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    return resolve_config(build_parser().parse_args(["append"] + argv))


def test_defaults_apply(monkeypatch, tmp_path):
    a = parse([], tmp_path=tmp_path, monkeypatch=monkeypatch)
    assert (a.epoch_size, a.num_buckets, a.write_mode, a.backfill) == \
        (1000, 32, "mor", False)


def test_toml_overrides_defaults(monkeypatch, tmp_path):
    a = parse([], toml_text='epoch_size = 77\nwrite_mode = "cow"\n'
                            'events_path = "/e"\nwarehouse = "/w"\n'
                            'backfill = true\n',
              tmp_path=tmp_path, monkeypatch=monkeypatch)
    assert (a.epoch_size, a.write_mode, a.events_path, a.backfill) == \
        (77, "cow", "/e", True)


def test_env_overrides_toml(monkeypatch, tmp_path):
    a = parse([], toml_text="epoch_size = 77\n",
              env={"SLDI_EPOCH_SIZE": "88", "SLDI_BACKFILL": "true"},
              tmp_path=tmp_path, monkeypatch=monkeypatch)
    assert a.epoch_size == 88 and a.backfill is True


def test_flag_overrides_env_and_toml(monkeypatch, tmp_path):
    a = parse(["--epoch-size", "99"], toml_text="epoch_size = 77\n",
              env={"SLDI_EPOCH_SIZE": "88"},
              tmp_path=tmp_path, monkeypatch=monkeypatch)
    assert a.epoch_size == 99


def test_unknown_toml_key_rejected(monkeypatch, tmp_path):
    with pytest.raises(SystemExit, match="unknown config keys"):
        parse([], toml_text="not_a_key = 1\n",
              tmp_path=tmp_path, monkeypatch=monkeypatch)


def test_wrong_toml_type_rejected(monkeypatch, tmp_path):
    with pytest.raises(SystemExit, match="expects int"):
        parse([], toml_text='epoch_size = "soon"\n',
              tmp_path=tmp_path, monkeypatch=monkeypatch)


def test_inspect_requires_existing_table(tmp_path, capsys):
    from main import main
    assert main(["inspect", "--warehouse", str(tmp_path / "nope")]) == 2


def test_inspect_reports_gauges(tmp_path, capsys, spark):
    """inspect is driver-side only (no Spark session of its own) and
    reports the reference's gauge surface: committed watermark, source
    tip from parquet footer stats, table/snapshot state."""
    import json

    from main import main
    from stellar_ledger_data_indexer_spark.job import IngestJob, JobConfig
    from stellar_ledger_data_indexer_spark.sources.change_stream import (
        StreamSpec, write_change_events)
    ep = str(tmp_path / "events")
    write_change_events(spark, ep,
                        StreamSpec(n_events=2000, n_docs=50,
                                   events_per_seq=100), partitions=2)
    wh = str(tmp_path / "wh")
    IngestJob(spark, JobConfig(events_path=ep, warehouse=wh, num_buckets=4,
                               epoch_size=10)).run(start=2, end=0,
                                                   backfill=True)
    capsys.readouterr()
    assert main(["inspect", "--warehouse", wh, "--events-path", ep]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["gauges"]["max_committed_hi"] == 21
    assert out["gauges"]["max_seq_in_source"] == 21
    assert out["target"]["snapshot"] >= 2
    assert out["last_epochs"]
