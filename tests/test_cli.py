"""CLI entry-point behaviors (`cli.py` — the reference's SLURM-driver
replacement, `execution_function_v15_4.py` / `scripts/script_PC_0_250.py`).

Covers the argument plumbing that has no other test surface: the
validation-split cap (--val-n) and the keyed --factory-cache contract.
"""

from __future__ import annotations

import json
import os
import pickle

import pytest

from multimodalspectraltransformer_tpu import cli


def _run(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr()
    return rc, out.out, out.err


def test_train_val_n_caps_split(tmp_path, capsys):
    """With 24 records, the default 10% split holds out 2 (train=22 forces a
    batch clamp below 23); --val-n 1 keeps 23 trainable so no clamp fires."""
    base = [
        "train", "--synthetic", "24", "--steps", "1", "--small",
        "--batch-size", "23", "--log-every", "1",
    ]
    rc, out, err = _run(base + ["--out", str(tmp_path / "a")], capsys)
    assert rc == 0
    assert "clamped to 22" in err
    rc, out, err = _run(base + ["--val-n", "1", "--out", str(tmp_path / "b")], capsys)
    assert rc == 0
    assert "clamped" not in err
    result = json.loads(out.strip().splitlines()[-1])
    assert os.path.exists(result["params"])


def test_factory_cache_key_mismatch_refuses(tmp_path, capsys):
    cache = tmp_path / "factory.pkl"
    with open(cache, "wb") as f:
        pickle.dump({"n": 10, "seed": 0, "records": []}, f)
    with pytest.raises(SystemExit, match="generated with"):
        cli.main([
            "train", "--factory", "20", "--factory-seed", "0",
            "--factory-cache", str(cache), "--steps", "1", "--small",
            "--out", str(tmp_path / "out"),
        ])


def test_factory_cache_roundtrip(tmp_path, capsys):
    """A cache written by one invocation is accepted (and used) by the next
    with matching --factory/--factory-seed."""
    cache = str(tmp_path / "factory.pkl")
    argv = [
        "train", "--factory", "8", "--factory-seed", "5",
        "--factory-cache", cache, "--steps", "1", "--small",
        "--batch-size", "4", "--out", str(tmp_path / "run"),
    ]
    rc, out, _ = _run(argv, capsys)
    assert rc == 0
    with open(cache, "rb") as f:
        cached = pickle.load(f)
    assert cached["n"] == 8 and cached["seed"] == 5 and cached["records"]
    # second run consumes the cache (same key) without error
    rc, out, _ = _run(argv[:-1] + [str(tmp_path / "run2")], capsys)
    assert rc == 0
