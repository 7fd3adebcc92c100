"""Native data engine tests: C++ vs pure-python implementations."""

import numpy as np
import pytest

from daspeech_tpu.data import native


class TestNative:
    def test_library_builds(self):
        assert native.native_available(), "g++ build of native engine failed"

    def test_batch_by_size_matches_python(self):
        rng = np.random.default_rng(0)
        num_tokens = rng.integers(5, 200, size=500).astype(np.int64)
        order = np.argsort(num_tokens, kind="stable").astype(np.int64)
        got = native.batch_by_size(order, num_tokens, max_tokens=1000,
                                   max_sentences=16, bsz_mult=8)
        want = native._batch_by_size_py(order, num_tokens, 1000, 16, 8)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # every sample appears exactly once
        all_ids = np.concatenate(got)
        np.testing.assert_array_equal(np.sort(all_ids), np.sort(order))
        # budget respected
        for g in got:
            assert len(g) <= 16
            assert len(g) * num_tokens[g].max() <= 1000 or len(g) == 1

    def test_batch_by_size_oversized_sample_goes_alone(self):
        """A sample with num_tokens > max_tokens must land alone in its own
        batch (fairseq semantics) — not produce an empty batch."""
        num_tokens = np.asarray([50, 3000, 60, 70], np.int64)
        order = np.arange(4, dtype=np.int64)
        got = native.batch_by_size(order, num_tokens, max_tokens=200,
                                   max_sentences=0, bsz_mult=1)
        want = native._batch_by_size_py(order, num_tokens, 200, 0, 1)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        assert all(len(g) > 0 for g in got)
        np.testing.assert_array_equal(np.sort(np.concatenate(got)), order)
        # the oversized sample is solo
        solo = [g for g in got if 1 in g]
        assert len(solo) == 1 and len(solo[0]) == 1

        # oversized sample in the last position: flushed by the tail
        num_tokens = np.asarray([50, 60, 3000], np.int64)
        order = np.arange(3, dtype=np.int64)
        got = native.batch_by_size(order, num_tokens, max_tokens=200)
        want = native._batch_by_size_py(order, num_tokens, 200, 0, 1)
        assert [g.tolist() for g in got] == [w.tolist() for w in want]

    def test_pack_frames(self):
        rng = np.random.default_rng(1)
        mats = [rng.normal(size=(t, 4)).astype(np.float32)
                for t in (3, 7, 5)]
        out = native.pack_frames(mats, t_cap=7)
        assert out.shape == (3, 7, 4)
        for b, m in enumerate(mats):
            np.testing.assert_array_equal(out[b, : len(m)], m)
            assert np.abs(out[b, len(m):]).max() == 0 if len(m) < 7 else True

    def test_pack_tokens(self):
        seqs = [np.array([5, 6, 7], np.int32), np.array([8], np.int32)]
        out = native.pack_tokens(seqs, t_cap=4, pad_value=1)
        np.testing.assert_array_equal(out[0], [5, 6, 7, 1])
        np.testing.assert_array_equal(out[1], [8, 1, 1, 1])
