"""Data pipeline tests: manifest loading, batching, augmentation, easy API."""

import json

import numpy as np
import pytest

from consistencytta_tpu.io.audio import write_wav
from consistencytta_tpu.text.tokenizer import HashTokenizer
from consistencytta_tpu.training.data import (
    DataLoader,
    T2ADataset,
    augment_batch,
    compute_gain_db,
    mix_sounds,
)


@pytest.fixture(scope="module")
def manifest(tmp_path_factory, rng):
    d = tmp_path_factory.mktemp("data")
    rows = []
    t = np.arange(16000) / 16000
    for i in range(7):
        path = str(d / f"c{i}.wav")
        write_wav(path, 0.4 * np.sin(2 * np.pi * (150 + 60 * i) * t))
        rows.append({"captions": f"tone number {i}", "location": path})
    mpath = str(d / "manifest.json")
    with open(mpath, "w") as f:
        json.dump({"data": rows}, f)
    return mpath


class TestDataset:
    def test_from_json(self, manifest):
        ds = T2ADataset.from_json(manifest, segment_length=16000)
        assert len(ds) == 7
        cap, wav = ds.load_item(0)
        assert cap == "tone number 0"
        assert wav.shape == (16000,)
        assert abs(np.abs(wav).max() - 0.5) < 0.01  # normalized

    def test_num_examples_cap(self, manifest):
        ds = T2ADataset.from_json(manifest, num_examples=3, segment_length=16000)
        assert len(ds) == 3

    def test_jsonl_format(self, tmp_path, manifest):
        ds0 = T2ADataset.from_json(manifest, segment_length=16000)
        jl = str(tmp_path / "m.jsonl")
        with open(jl, "w") as f:
            for c, p in zip(ds0.captions, ds0.paths):
                f.write(json.dumps({"captions": c, "location": p}) + "\n")
        ds = T2ADataset.from_json(jl, segment_length=16000)
        assert len(ds) == 7


class TestLoader:
    def test_batches_fixed_shape(self, manifest):
        ds = T2ADataset.from_json(manifest, segment_length=16000)
        loader = DataLoader(ds, HashTokenizer(), batch_size=3, text_len=12)
        batches = list(loader)
        assert len(batches) == 2  # 7 items -> 2 full batches of 3
        for b in batches:
            assert b["wav"].shape == (3, 16000)
            assert b["ids"].shape == (3, 12)
            assert len(b["captions"]) == 3

    def test_shuffle_differs_by_seed(self, manifest):
        ds = T2ADataset.from_json(manifest, segment_length=16000)
        l1 = list(DataLoader(ds, HashTokenizer(), 3, 12, seed=0))
        l2 = list(DataLoader(ds, HashTokenizer(), 3, 12, seed=1))
        assert l1[0]["captions"] != l2[0]["captions"]
        # same seed reproduces exactly
        l1b = list(DataLoader(ds, HashTokenizer(), 3, 12, seed=0))
        assert l1[0]["captions"] == l1b[0]["captions"]

    def test_augmented_batches(self, manifest):
        ds = T2ADataset.from_json(manifest, segment_length=16000)
        loader = DataLoader(
            ds, HashTokenizer(), batch_size=3, text_len=16, augment=True
        )
        b = next(iter(loader))
        assert b["wav"].shape == (3, 16000)
        assert any(" and " in c for c in b["captions"])  # mixed caption


class TestMixing:
    def test_gain_db(self, rng):
        loud = rng.standard_normal(16000).astype(np.float64)
        quiet = loud * 0.01
        assert compute_gain_db(loud, 16000).max() > compute_gain_db(
            quiet, 16000
        ).max()

    def test_mix_balances_loudness(self, rng):
        a = rng.standard_normal(16000) * 0.5
        b = rng.standard_normal(16000) * 0.005
        mixed = mix_sounds(a, b, 0.5, 16000)
        assert mixed.shape == a.shape
        # the quiet signal is boosted relative to naive 50/50 averaging
        corr_b = np.abs(np.corrcoef(mixed, b)[0, 1])
        assert corr_b > 0.2


class TestEasyAPI:
    @pytest.mark.slow
    def test_easy_generate_tiny(self):
        from consistencytta_tpu.configs import PipelineConfig
        from consistencytta_tpu.easy import ConsistencyTTA

        model = ConsistencyTTA(
            random_init_seed=0,
            text_len=8,
            use_bf16=False,
            pipeline_config=PipelineConfig.tiny(),
        )
        wav = model("a small bell rings", cfg_scale_input=3.0, seed=0)
        assert wav.shape[0] == 1
        assert np.isfinite(wav).all()
        two = model(["a", "b"], num_samples=2, seed=0)
        assert two.shape[0] == 4
