"""Logic test for the sustained whole-loop training bench (VERDICT r4
item 1): ``bench.bench_sustained_train`` drives the REAL ``cli.train``
loop over a synthetic zip-packed fixture and times updates from the
emitted log-record wall clock. Run here at toy scale on CPU; the TPU
bench runs it at the recipe's max-tokens 40000."""

import sys
from pathlib import Path

import pytest
import yaml

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_sustained_bench_logic(tmp_path):
    import bench
    from test_cli import TINY_MODEL

    (tmp_path / "tiny.yaml").write_text(yaml.safe_dump(TINY_MODEL))
    rec = bench.bench_sustained_train(
        train_rec={"value": 10.0},
        updates=6, settle=2,
        fixture_root=str(tmp_path / "data"),
        fixture_kwargs=dict(n_utts=12, frames=(20, 40), words=(2, 5)),
        max_tokens=512,
        extra_argv=["--model-yaml", str(tmp_path / "tiny.yaml"),
                    "--max-source-positions", "100",
                    "--max-target-positions", "32",
                    "--num-buckets", "1"])
    assert rec["metric"] == "sustained_train_ms_per_update"
    assert rec["value"] > 0
    assert rec["updates_timed"] >= 1
    assert rec["input_wait_frac"] is not None
    assert 0.0 <= rec["input_wait_frac"] <= 1.0
    assert rec["data_wait_ms"] is not None
    assert rec["isolated_step_ms"] == 10.0
    assert "gap_vs_isolated_pct" in rec
    # the fixture is cached: a second call reuses it
    tsv = Path(tmp_path / "data" / "train.tsv")
    mtime = tsv.stat().st_mtime
    rec2 = bench.bench_sustained_train(
        train_rec={"value": 10.0},
        updates=4, settle=2,
        fixture_root=str(tmp_path / "data"),
        max_tokens=512,
        h2d_info={"h2d_bw_MBps": 100.0, "h2d_rtt_ms": 1.0},
        metric_name="sustained_train_bf16h2d_ms_per_update",
        extra_argv=["--model-yaml", str(tmp_path / "tiny.yaml"),
                    "--max-source-positions", "100",
                    "--max-target-positions", "32",
                    "--num-buckets", "1",
                    "--h2d-dtype", "bfloat16"])
    assert tsv.stat().st_mtime == mtime
    assert rec2["value"] > 0
    assert rec2["metric"] == "sustained_train_bf16h2d_ms_per_update"
    # wire-byte accounting: the bf16 run halves the fbank bytes, and the
    # tunnel-floor attribution fields ride the provided h2d_info
    assert rec2["h2d_mb_per_step"] > 0
    assert rec["h2d_mb_per_step"] > rec2["h2d_mb_per_step"] > 0
    assert rec2["tunnel_floor_ms_per_update"] > 10.0
    assert "gap_vs_tunnel_floor_pct" in rec2


def test_measure_h2d_fields():
    import bench
    info = bench.measure_h2d(mb=2, reps=2)
    assert info["h2d_bw_MBps"] > 0
    assert info["h2d_rtt_ms"] >= 0
    assert info["h2d_big_put_mb"] == 2.0
