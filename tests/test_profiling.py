"""Profiling utilities + trainer integration (sample dumps, throughput)."""

import os

import numpy as np
import pytest

from scream_tpu.config import ModelConfig, RenderConfig, TrainConfig
from scream_tpu.data import PairLoader, SyntheticPairDataset
from scream_tpu.train.trainer import RegistrationTrainer
from scream_tpu.utils.profiling import ThroughputMeter, trace


class TestThroughputMeter:
    def test_warmup_excluded_and_rate(self):
        import time

        m = ThroughputMeter(warmup_steps=1)
        m.step(10)  # warmup (compile) step, excluded
        for _ in range(5):
            time.sleep(0.01)
            m.step(10)
        rate = m.items_per_sec
        assert 100 < rate < 4000  # ~1000/s nominal, loose bounds

    def test_nan_before_data(self):
        m = ThroughputMeter()
        assert np.isnan(m.items_per_sec)
        assert m.summary()["steps"] == 0.0


class TestTrace:
    def test_noop_without_dir(self):
        with trace(None):
            pass

    def test_writes_profile(self, tmp_path):
        import jax
        import jax.numpy as jnp

        with trace(str(tmp_path)):
            jnp.ones((8, 8)).sum().block_until_ready()
        # jax profiler writes a plugins/profile tree
        found = []
        for root, dirs, files in os.walk(tmp_path):
            found.extend(files)
        assert found, "trace produced no files"


class TestTrainerIntegration:
    def test_gan_sample_dump_and_throughput(self, tmp_path):
        ds = SyntheticPairDataset(length=4, n_src=48, n_tgt=48, seed=11)
        mk = lambda: PairLoader(ds, batch_size=2, src_capacity=48,
                                tgt_capacity=48, num_workers=0)
        tr = RegistrationTrainer(
            mk(), mk(),
            model_cfg=ModelConfig(d_model=32, num_heads=4, self_layers=1,
                                  cross_layers=1, dtype="float32"),
            train_cfg=TrainConfig(epochs=2, use_gan=True, save_img_iter=1),
            render_cfg=RenderConfig(rho=6.0, width=32, multi_view=False),
            sample_img_dir=str(tmp_path / "imgs"),
        )
        tr.init()
        metrics = tr.train_epoch(1)
        assert "pairs_per_sec" in metrics
        dumps = os.listdir(tmp_path / "imgs")
        assert len(dumps) >= 1 and dumps[0].endswith(".png")


class TestMetricsLogger:
    def test_jsonl_records(self, tmp_path):
        import json

        from scream_tpu.utils.logging import MetricsLogger

        path = tmp_path / "metrics.jsonl"
        log = MetricsLogger(jsonl_path=str(path), print_every=100)
        log.log(1, {"loss": 0.5}, prefix="train")
        log.log(2, {"loss": 0.25, "rre": 3.0}, prefix="val")
        log.close()
        lines = [json.loads(l) for l in path.read_text().splitlines()]
        assert lines[0] == {"step": 1, "prefix": "train", "loss": 0.5}
        assert lines[1]["rre"] == 3.0

    def test_progressbar(self):
        from scream_tpu.utils.logging import progressbar

        s = progressbar(5, 10, width=10)
        assert "5/10" in s and s.count("█") == 5
