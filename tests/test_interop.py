"""Arrow interchange layer: extraction, packing, output assembly."""

import numpy as np
import pyarrow as pa
import pytest

from polars_matmul_tpu.interop import (
    ExtractError,
    column_dim,
    extract_matrix,
    matrix_to_arrow,
    native_available,
    promote_pair,
    topk_to_arrow,
)
from polars_matmul_tpu.interop.native import native_pack_list


class TestExtract:
    def test_fixed_size_list_zero_copy(self):
        data = np.arange(12, dtype=np.float64).reshape(4, 3)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(data.reshape(-1)), 3)
        out = extract_matrix(arr)
        np.testing.assert_array_equal(out, data)
        assert out.dtype == np.float64

    def test_fixed_size_list_f32(self):
        data = np.arange(6, dtype=np.float32).reshape(2, 3)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(data.reshape(-1)), 3
        )
        out = extract_matrix(arr)
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, data)

    def test_list_regular(self):
        arr = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
        out = extract_matrix(arr)
        np.testing.assert_array_equal(
            out, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
        )

    def test_list_with_null_row(self):
        # nulls -> 0.0 rows (reference matmul.rs:251,280)
        arr = pa.array([[1.0, 2.0], None, [5.0, 6.0]])
        out = extract_matrix(arr)
        np.testing.assert_array_equal(
            out, [[1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        )

    def test_fixed_size_list_null_row(self):
        t = pa.list_(pa.float64(), 2)
        arr = pa.array([[1.0, 2.0], None, [5.0, 6.0]], type=t)
        out = extract_matrix(arr)
        np.testing.assert_array_equal(
            out, [[1.0, 2.0], [0.0, 0.0], [5.0, 6.0]]
        )

    def test_ragged_list_raises(self):
        arr = pa.array([[1.0, 2.0], [3.0]])
        with pytest.raises((ExtractError, ValueError)):
            extract_matrix(arr)

    def test_empty_raises(self):
        arr = pa.array([], type=pa.list_(pa.float64()))
        with pytest.raises(ExtractError, match="Empty series"):
            extract_matrix(arr)

    def test_f16_casts_up(self):
        # f16 is storage-only; compute casts up (README.md:154-156)
        data = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float16)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(data.reshape(-1)), 2
        )
        out = extract_matrix(arr)
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, data.astype(np.float64))

    def test_integer_embeddings_cast(self):
        arr = pa.array([[1, 2], [3, 4]])
        out = extract_matrix(arr)
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])

    def test_sliced_fixed_size_list(self):
        data = np.arange(12, dtype=np.float64).reshape(4, 3)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(data.reshape(-1)), 3
        ).slice(1, 2)
        out = extract_matrix(arr)
        np.testing.assert_array_equal(out, data[1:3])

    def test_chunked(self):
        a1 = pa.array([[1.0, 2.0]])
        a2 = pa.array([[3.0, 4.0]])
        ch = pa.chunked_array([a1, a2])
        out = extract_matrix(ch)
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])

    def test_column_dim(self):
        assert column_dim(pa.array([[1.0, 2.0, 3.0]])) == 3
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(np.zeros(8)), 4
        )
        assert column_dim(fsl) == 4


class TestPromotion:
    def test_both_f32(self):
        assert promote_pair(pa.float32(), pa.float32()) == np.float32

    def test_mixed_promotes_f64(self):
        # both-f32 rule (matmul.rs:13-19)
        assert promote_pair(pa.float32(), pa.float64()) == np.float64
        assert promote_pair(pa.float64(), pa.float32()) == np.float64
        assert promote_pair(pa.float64(), pa.float64()) == np.float64


class TestOutputAssembly:
    def test_topk_to_arrow(self):
        idx = np.array([[1, 0], [2, 1]], dtype=np.uint32)
        scr = np.array([[0.9, 0.5], [0.8, 0.2]])
        out = topk_to_arrow(idx, scr)
        t = pa.list_(pa.struct([("index", pa.uint32()), ("score", pa.float64())]))
        assert out.type == t
        rows = out.to_pylist()
        assert rows[0] == [
            {"index": 1, "score": 0.9},
            {"index": 0, "score": 0.5},
        ]
        assert rows[1][0]["index"] == 2

    def test_matrix_to_arrow(self):
        m = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
        out = matrix_to_arrow(m)
        assert pa.types.is_fixed_size_list(out.type)
        assert out.type.list_size == 2
        assert out.type.value_type == pa.float32()
        assert out.to_pylist() == [[1.0, 2.0], [3.0, 4.0]]


class TestNative:
    def test_native_builds(self):
        # The C++ library should build in this environment (g++ present).
        assert native_available()

    def test_native_pack_matches_numpy(self):
        values = np.arange(10, dtype=np.float64)
        offsets = np.array([0, 2, 4, 6, 8, 10], dtype=np.int64)
        out = native_pack_list(values, offsets, None, 5, 2)
        if out is None:
            pytest.skip("native unavailable")
        np.testing.assert_array_equal(out, values.reshape(5, 2))

    def test_native_pack_validity(self):
        values = np.arange(6, dtype=np.float32)
        offsets = np.array([0, 2, 2, 4], dtype=np.int64)
        validity = np.array([True, False, True])
        out = native_pack_list(values, offsets, validity, 3, 2)
        if out is None:
            pytest.skip("native unavailable")
        np.testing.assert_array_equal(
            out, [[0.0, 1.0], [0.0, 0.0], [2.0, 3.0]]
        )

    def test_native_pack_mismatch_raises(self):
        values = np.arange(5, dtype=np.float64)
        offsets = np.array([0, 2, 5], dtype=np.int64)
        if not native_available():
            pytest.skip("native unavailable")
        with pytest.raises(ValueError, match="Dimension mismatch"):
            native_pack_list(values, offsets, None, 2, 2)


class TestArrowAdversarial:
    """Offset/validity/chunking corners of the Arrow marshaling layer
    (reference matmul.rs:22-286 semantics: nulls -> 0.0, dim from first
    row, zero-copy only for clean FixedSizeList)."""

    def test_sliced_fixed_size_list(self):
        import pyarrow as pa

        data = np.arange(24, dtype=np.float32).reshape(8, 3)
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(data.reshape(-1)), 3
        )
        sliced = arr.slice(2, 4)  # rows 2..5
        out = extract_matrix(sliced)
        np.testing.assert_array_equal(out, data[2:6])

    def test_sliced_ragged_list(self):
        import pyarrow as pa

        rows = [[float(3 * i), float(3 * i + 1), float(3 * i + 2)]
                for i in range(8)]
        arr = pa.array(rows, type=pa.list_(pa.float64()))
        out = extract_matrix(arr.slice(3, 4))
        np.testing.assert_array_equal(
            out, np.asarray(rows[3:7], dtype=np.float64))

    def test_chunked_array_combines(self):
        import pyarrow as pa

        a = pa.array([[1.0, 2.0], [3.0, 4.0]])
        b = pa.array([[5.0, 6.0]])
        chunked = pa.chunked_array([a, b])
        out = extract_matrix(chunked)
        np.testing.assert_array_equal(
            out, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])

    def test_null_rows_become_zero(self):
        import pyarrow as pa

        arr = pa.array([[1.0, 2.0], None, [5.0, 6.0]])
        out = extract_matrix(arr)
        np.testing.assert_array_equal(out[1], [0.0, 0.0])
        np.testing.assert_array_equal(out[0], [1.0, 2.0])

    def test_inner_nulls_become_zero(self):
        import pyarrow as pa

        arr = pa.array([[1.0, None], [None, 4.0]])
        out = extract_matrix(arr)
        np.testing.assert_array_equal(out, [[1.0, 0.0], [0.0, 4.0]])

    def test_ragged_length_mismatch_raises(self):
        import pyarrow as pa

        arr = pa.array([[1.0, 2.0], [3.0, 4.0, 5.0]])
        with pytest.raises(ValueError, match="[Dd]imension"):
            extract_matrix(arr)

    def test_large_list(self):
        import pyarrow as pa

        arr = pa.array([[1.0, 2.0], [3.0, 4.0]],
                       type=pa.large_list(pa.float64()))
        out = extract_matrix(arr)
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])

    def test_integer_embeddings_cast(self):
        import pyarrow as pa

        arr = pa.array([[1, 2], [3, 4]], type=pa.list_(pa.int32()))
        out = extract_matrix(arr)
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, [[1.0, 2.0], [3.0, 4.0]])

    def test_f16_storage_casts_up(self):
        import pyarrow as pa

        vals = np.asarray([1.5, -2.25, 0.5, 4.0], dtype=np.float16)
        arr = pa.FixedSizeListArray.from_arrays(pa.array(vals), 2)
        out = extract_matrix(arr)
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, vals.reshape(2, 2).astype(np.float64))

    def test_null_first_row_raises(self):
        import pyarrow as pa

        arr = pa.array([None, [1.0, 2.0]])
        with pytest.raises(ValueError, match="null"):
            extract_matrix(arr)

    def test_e2e_topk_with_sliced_null_column(self):
        import pyarrow as pa

        import polars_matmul_tpu as pmt

        q = pa.array([None, [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]).slice(1, 3)
        c = pa.array([[1.0, 0.0], [0.0, 1.0], None, [0.5, 0.5]])
        out = pmt.topk_arrow(q, c, k=2, metric="dot").to_pylist()
        assert out[0][0]["index"] == 0          # q=[1,0] best matches c0
        assert out[1][0]["index"] == 1


def test_topk_arrow_mask():
    """Arrow-surface filtered search; null mask entries count as excluded."""
    import pyarrow as pa

    import polars_matmul_tpu as pmt

    q = pa.array([[1.0, 0.0], [0.0, 1.0]])
    c = pa.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.1, 0.9]])
    mask = pa.array([False, True, None, True])  # null -> excluded
    out = pmt.topk_arrow(q, c, k=1, metric="dot", mask=mask).to_pylist()
    assert out[0][0]["index"] == 1
    assert out[1][0]["index"] == 3


class TestNativeQuantize:
    """The C++ fused int8 quantizer must be bit-interchangeable with the
    NumPy fallback: corpora built through either path (or a mix — e.g. a
    native-built corpus updated on a box without a toolchain) must hold
    identical codes."""

    def test_bit_identical_to_numpy_fallback(self):
        from polars_matmul_tpu.interop.native import native_quantize_i8

        if not native_available():
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(7)
        c = rng.standard_normal((500, 48)).astype(np.float32)
        c[3] = 0.0          # zero row: scale 1.0, codes 0
        c[4] = -c[4]        # sign symmetry
        amax = np.abs(c).max(axis=1)
        s = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        ref = np.rint(c / s[:, None]).astype(np.int8)
        codes, scales = native_quantize_i8(c)
        np.testing.assert_array_equal(scales, s)
        np.testing.assert_array_equal(codes, ref)

    def test_f64_input_matches_f32_path(self):
        from polars_matmul_tpu.api.search import _quantize_rows_np

        rng = np.random.default_rng(8)
        c = rng.standard_normal((100, 16)).astype(np.float32)
        c32 = _quantize_rows_np(c)                      # native if available
        c64 = _quantize_rows_np(c.astype(np.float64))   # NumPy chunked path
        np.testing.assert_array_equal(c32[0], c64[0])
        np.testing.assert_array_equal(c32[1], c64[1])

    def test_int4_bit_identical_to_numpy_fallback(self):
        from polars_matmul_tpu.interop.native import native_quantize_i4
        from polars_matmul_tpu.kernels.fused_topk import feature_geometry

        if not native_available():
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(9)
        for dim in (16, 100, 256):
            ck, dpp, _ = feature_geometry(dim)
            c = rng.standard_normal((200, dim)).astype(np.float32)
            c[1] = 0.0
            amax = np.abs(c).max(axis=1)
            s = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
            codes = np.clip(np.rint(c / s[:, None]), -7, 7).astype(np.int32)
            codes = np.pad(codes, ((0, 0), (0, dpp - dim)))
            ch = codes.reshape(200, dpp // ck, ck)
            ref = ((ch[:, :, : ck // 2] & 0xF)
                   | ((ch[:, :, ck // 2:] & 0xF) << 4)
                   ).astype(np.int8).reshape(200, dpp // 2)
            packed, scales = native_quantize_i4(c, ck, dpp)
            np.testing.assert_array_equal(scales, s, err_msg=f"dim={dim}")
            np.testing.assert_array_equal(packed, ref, err_msg=f"dim={dim}")
