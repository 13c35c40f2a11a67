"""CLI entry points driven in-process (CPU via conftest)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import inference  # noqa: E402
import spmm_test  # noqa: E402
import sweep  # noqa: E402
import train  # noqa: E402


def test_spmm_test_cli(tmp_path, capsys):
    spmm_test.main([
        "--dataset", "tiny", "--hidden_size", "16", "--repeat", "1",
        "--data_type", "float32", "--data_root", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "[DATA]pim_time_spmm(ms)" in out
    assert "[DATA]verify: OK" in out


def test_spmm_test_cli_mesh_fallback(tmp_path, capsys):
    spmm_test.main([
        "--dataset", "tiny", "--hidden_size", "16", "--repeat", "1",
        "--data_type", "float32", "--data_root", str(tmp_path),
        "--sp_parts", "64", "--ds_parts", "4",
    ])
    out = capsys.readouterr().out
    assert "running single-chip" in out


def test_spmm_test_cli_unknown_dataset(tmp_path):
    with pytest.raises(SystemExit):
        spmm_test.main(["--dataset", "nope", "--data_root", str(tmp_path)])


def test_inference_cli_int8(tmp_path, capsys):
    inference.main([
        "--dataset", "tiny", "--hidden_size", "16", "--model", "sage",
        "--data_type", "int8", "--repeat", "1", "--data_root", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "[DATA]infer_time(ms)" in out
    assert "[DATA]test_acc" in out


def test_inference_cli_cpu_version(tmp_path, capsys):
    inference.main([
        "--dataset", "tiny", "--hidden_size", "16", "--version", "cpu",
        "--repeat", "1", "--data_root", str(tmp_path),
    ])
    assert "[DATA]infer_time(ms)" in capsys.readouterr().out


def test_train_cli(tmp_path, capsys):
    train.main([
        "--dataset", "tiny", "--hidden_size", "16", "--epochs", "2",
        "--data_root", str(tmp_path),
        "--checkpoint", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    assert "[DATA]train_loss" in out
    ck = tmp_path / "ck"
    assert (ck / "meta.json").exists()
    assert (ck / "params.npz").exists() or (ck / "orbax").exists()


def test_sweep_cli_dry_run_and_parse(tmp_path, capsys):
    sweep.main([
        "run", "--set", "small", "--results", str(tmp_path / "r"),
        "--dry_run",
    ])
    (tmp_path / "r").mkdir(exist_ok=True)  # dry_run creates nothing
    sweep.main(["parse", "--results", str(tmp_path / "r")])
    with pytest.raises(SystemExit):
        sweep.main(["parse", "--results", str(tmp_path / "missing")])
