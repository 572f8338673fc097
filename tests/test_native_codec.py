"""Native C++ logits codec: format compatibility with the numpy path."""
import numpy as np
import pytest

from cream_tpu.distill import LogitsReader, LogitsWriter
from cream_tpu.distill import native


@pytest.mark.skipif(not native.available(), reason="native codec not built")
class TestNativeCodec:
    def _make(self, tmp_path, use_native_writer: bool):
        K, C, N = 7, 1000, 64
        rng = np.random.default_rng(0)
        vals = rng.random((N, K)).astype(np.float32) * 0.3
        idxs = rng.integers(0, C, (N, K)).astype(np.int32)
        seeds = rng.integers(0, 2**31, (N,)).astype(np.int32)
        w = LogitsWriter(str(tmp_path), 0, N, K, C,
                         use_native=use_native_writer)
        order = rng.permutation(N)
        for i in range(0, N, 16):
            sel = order[i:i + 16]
            w.write_batch(sel, seeds[sel], vals[sel], idxs[sel])
        w.close()
        return vals, idxs, seeds

    @pytest.mark.parametrize("native_writer,native_reader",
                             [(True, True), (True, False), (False, True)])
    def test_cross_compatibility(self, tmp_path, native_writer, native_reader):
        """Native and numpy paths must produce/consume the identical format."""
        vals, idxs, seeds = self._make(tmp_path, native_writer)
        r = LogitsReader(str(tmp_path), 0, use_native=native_reader)
        gv, gi, gs = r.read_batch(np.arange(len(vals)))
        np.testing.assert_allclose(gv, vals, atol=1e-3)
        np.testing.assert_array_equal(gi, idxs)
        np.testing.assert_array_equal(gs, seeds)

    def test_fp16_conversion_edge_cases(self, tmp_path):
        K, C, N = 4, 10, 4
        # exact fp16 values must roundtrip bit-exactly through the C++ codec
        vals = np.asarray([[0.5, 0.25, 0.125, 0.0625],
                           [1.0, 0.0, 2.0 ** -14, 0.099975586],
                           [0.33325195, 0.19995117, 0.10003662, 0.04998779],
                           [65504.0, 1e-8, 0.1, 0.3]], np.float32)
        f16 = vals.astype(np.float16).astype(np.float32)
        idxs = np.arange(N * K, dtype=np.int32).reshape(N, K) % C
        seeds = np.arange(N, dtype=np.int32)
        w = LogitsWriter(str(tmp_path), 0, N, K, C, use_native=True)
        w.write_batch(np.arange(N), seeds, vals, idxs)
        w.close()
        r = LogitsReader(str(tmp_path), 0, use_native=False)  # numpy decode
        gv, _, _ = r.read_batch(np.arange(N))
        np.testing.assert_array_equal(gv, f16)

    def test_nonfinite_roundtrip_matches_numpy(self, tmp_path):
        """NaN must survive the native f32->f16 path (ADVICE r1): the numpy
        fallback preserves NaN, so the native store must too."""
        K, C, N = 4, 10, 2
        vals = np.asarray([[np.nan, np.inf, -np.inf, 1.5],
                           [0.0, -0.0, np.nan, 65504.0]], np.float32)
        idxs = np.arange(N * K, dtype=np.int32).reshape(N, K) % C
        seeds = np.arange(N, dtype=np.int32)
        for use_native in (True, False):
            d = tmp_path / f"native{use_native}"
            d.mkdir()
            w = LogitsWriter(str(d), 0, N, K, C, use_native=use_native)
            w.write_batch(np.arange(N), seeds, vals, idxs)
            w.close()
            gv, _, _ = LogitsReader(str(d), 0,
                                    use_native=False).read_batch(np.arange(N))
            expect = vals.astype(np.float16).astype(np.float32)
            np.testing.assert_array_equal(np.isnan(gv), np.isnan(expect))
            np.testing.assert_array_equal(gv[~np.isnan(expect)],
                                          expect[~np.isnan(expect)])


class TestCheckSavedLogits:
    def test_tie_tolerant_index_miss(self, tmp_path):
        """Tied fp16 probs stored in swapped order inflate the reference's
        elementwise index_diff_rate but NOT the tie-aware index_miss_rate."""
        from cream_tpu.distill.logits_store import check_saved_logits
        K, C, N = 3, 8, 4
        probs = np.zeros((N, C), np.float32)
        probs[:, 0], probs[:, 1], probs[:, 2] = 0.25, 0.25, 0.125  # 0/1 tied
        probs[:, 3:] = 0.375 / 5
        # store top-K with the tie pair in the OPPOSITE order vs argsort
        vals = np.tile(np.asarray([0.25, 0.25, 0.125], np.float32), (N, 1))
        idxs = np.tile(np.asarray([1, 0, 2], np.int32), (N, 1))
        seeds = np.arange(N, dtype=np.int32)
        w = LogitsWriter(str(tmp_path), 0, N, K, C, use_native=False)
        w.write_batch(np.arange(N), seeds, vals, idxs)
        w.close()
        r = LogitsReader(str(tmp_path), 0, use_native=False)
        out = check_saved_logits(
            r, lambda img: probs,
            [{"index": np.arange(N), "image": None}])
        assert out["index_diff_rate"] > 0.5        # order flip looks bad...
        assert out["index_miss_rate"] == 0.0       # ...but nothing is wrong
        assert out["value_abs_err"] < 1e-3
