import json
import numpy as np
import jax.numpy as jnp
import pytest

from mmrp_tpu.utils.checkpoint import CheckpointManager
from mmrp_tpu.utils.logging import MetricWriter, StepTimer, TeeLogger


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), "run1", {"lr": 1e-3})
    w.log({"loss": 1.5, "acc": jnp.asarray(0.5)}, step=0)
    w.log({"loss": 1.2}, step=1)
    w.close()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().split("\n")
    assert len(lines) == 2
    row0 = json.loads(lines[0])
    assert row0["loss"] == 1.5 and row0["acc"] == 0.5 and row0["step"] == 0
    cfg = json.loads((tmp_path / "run_config.json").read_text())
    assert cfg["lr"] == 1e-3 and cfg["run_name"] == "run1"


def test_tee_logger(tmp_path):
    log = TeeLogger(str(tmp_path / "out.txt"))
    log("hello")
    log("world")
    assert (tmp_path / "out.txt").read_text() == "hello\nworld\n"


def test_step_timer():
    t = StepTimer(total_steps=10)
    assert t.tick() == {}
    out = t.tick()
    assert "step_time_s" in out and out["eta_s"] >= 0


def test_checkpoint_manager_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state)
    assert mgr.latest_step() == 3
    template = {"w": jnp.zeros((2, 3)), "step": jnp.asarray(0)}
    restored = mgr.restore(template)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(state["w"]))
    assert int(restored["step"]) == 3


def test_checkpoint_best_tracking(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    s1 = {"w": jnp.ones((2,))}
    s2 = {"w": jnp.full((2,), 2.0)}
    assert mgr.update_best(0.5, s1, {"f1": 0.5})
    assert not mgr.update_best(0.4, s2, {"f1": 0.4})  # worse -> no save
    assert mgr.update_best(0.7, s2, {"f1": 0.7})
    restored = mgr.restore_best({"w": jnp.zeros((2,))})
    np.testing.assert_allclose(np.asarray(restored["w"]), 2.0)
    best = mgr.best_metrics()
    assert best["f1"] == 0.7 and best["_best_value"] == 0.7


def test_checkpoint_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore({"w": jnp.zeros(1)})
