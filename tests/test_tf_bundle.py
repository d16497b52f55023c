"""TensorBundle reader/writer + TF-source I3D conversion.

Closes the reference's TF-source converter path
(`/root/reference/evaluations/fvd/convert_tf_pretrained.py`): the TF-Hub
i3d-kinetics module's `variables/variables.{index,data-*}` TensorBundle is
parsed in pure Python (`evaluation/tf_bundle.py`) and mapped onto the flax
InceptionI3d tree.  Coverage:

* self round-trip (write_bundle -> BundleReader) over mixed dtypes, >1
  table block, prefix-compressed keys, restart points;
* CRC corruption detection at both the block and tensor level;
* hand-encoded snappy streams (literal + every copy-tag width + overlap);
* golden cross-validation against REAL TensorFlow (SaveV2 -> our reader,
  our writer -> RestoreV2) when tensorflow is importable;
* full fake-I3D conversion: sonnet-named variables (incl. the Mixed_5b
  Branch_2 '0a' typo, convert_tf_pretrained.py:34-41) -> flax tree whose
  structure matches InceptionI3d.init exactly.
"""

import os

import numpy as np
import pytest

import jax

from mm_diffusion_tpu.evaluation.i3d import INCEPTION_CFG, InceptionI3d
from mm_diffusion_tpu.evaluation.tf_bundle import (
    BundleReader,
    convert_tf_i3d,
    crc32c,
    find_bundle_prefix,
    load_tf_i3d,
    masked_crc32c,
    read_table,
    snappy_decompress,
    write_bundle,
)


# ---------------------------------------------------------------------------
# crc32c
# ---------------------------------------------------------------------------


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli).
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


# ---------------------------------------------------------------------------
# snappy
# ---------------------------------------------------------------------------


def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            return bytes(out)


def test_snappy_literal():
    payload = b"hello tensorbundle"
    blob = _varint(len(payload)) + bytes([(len(payload) - 1) << 2]) + payload
    assert snappy_decompress(blob) == payload


def test_snappy_copies_including_overlap():
    # "ab" then an overlapping copy (offset 2, len 18) -> "ab"*10.
    blob = _varint(20)
    blob += bytes([(2 - 1) << 2]) + b"ab"
    blob += bytes([((18 - 1) << 2) | 2]) + (2).to_bytes(2, "little")
    assert snappy_decompress(blob) == b"ab" * 10

    # 1-byte-offset copy: literal "abcd", copy offset 4 len 4 -> "abcdabcd".
    blob = _varint(8) + bytes([(4 - 1) << 2]) + b"abcd"
    blob += bytes([((4 - 4) << 2) | 1]) + bytes([4])
    assert snappy_decompress(blob) == b"abcdabcd"

    # 4-byte-offset copy tag.
    blob = _varint(8) + bytes([(4 - 1) << 2]) + b"abcd"
    blob += bytes([((4 - 1) << 2) | 3]) + (4).to_bytes(4, "little")
    assert snappy_decompress(blob) == b"abcdabcd"


def test_snappy_rejects_bad_offset():
    blob = _varint(4) + bytes([(2 - 1) << 2]) + b"ab"
    blob += bytes([((4 - 4) << 2) | 1]) + bytes([9])  # offset 9 > written 2
    with pytest.raises(ValueError):
        snappy_decompress(blob)


# ---------------------------------------------------------------------------
# bundle round-trip
# ---------------------------------------------------------------------------


def _mixed_tensors(rng):
    return {
        "scalar": np.float32(3.5).reshape(()),
        "net/layer_1/w": rng.standard_normal((3, 3, 3, 4, 8)).astype(np.float32),
        "net/layer_1/b": rng.standard_normal((8,)).astype(np.float64),
        "net/layer_2/w": rng.integers(-5, 5, (16, 16)).astype(np.int32),
        "net/ids": rng.integers(0, 2**40, (7,)).astype(np.int64),
        "net/mask": rng.integers(0, 2, (33,)).astype(bool),
        "net/half": rng.standard_normal((5, 5)).astype(np.float16),
        "net/bytes": rng.integers(0, 255, (9,)).astype(np.uint8),
    }


def test_roundtrip_mixed_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = _mixed_tensors(rng)
    prefix = str(tmp_path / "ckpt" / "variables")
    write_bundle(prefix, tensors)
    assert os.path.exists(prefix + ".index")
    assert os.path.exists(prefix + ".data-00000-of-00001")

    r = BundleReader(prefix)
    assert sorted(r.keys()) == sorted(tensors)
    for name, ref in tensors.items():
        got = r.get(name)
        assert got.dtype == ref.dtype, name
        assert got.shape == ref.shape, name
        np.testing.assert_array_equal(got, ref)
    # graph-style ':0' suffixes resolve to the checkpoint key
    np.testing.assert_array_equal(r.get("net/ids:0"), tensors["net/ids"])


def test_roundtrip_many_keys_multi_block(tmp_path):
    # >4 KiB of index entries forces multiple table blocks; long shared
    # prefixes + 16-entry restart interval exercise the prefix codec.
    rng = np.random.default_rng(1)
    tensors = {
        f"model/very/long/shared/prefix/block_{i:04d}/kernel": rng.standard_normal(
            (i % 7 + 1,)
        ).astype(np.float32)
        for i in range(300)
    }
    prefix = str(tmp_path / "variables")
    write_bundle(prefix, tensors)

    table = read_table(prefix + ".index")
    assert b"" in table  # header record
    assert len(table) == 301

    r = BundleReader(prefix)
    for name, ref in tensors.items():
        np.testing.assert_array_equal(r.get(name), ref)


def test_crc_detects_corruption(tmp_path):
    rng = np.random.default_rng(2)
    tensors = {"w": rng.standard_normal((64,)).astype(np.float32)}
    prefix = str(tmp_path / "variables")
    write_bundle(prefix, tensors)

    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[10] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc"):
        BundleReader(prefix).get("w")
    # verification can be opted out (still decodes the corrupted bytes)
    assert BundleReader(prefix, verify=False).get("w").shape == (64,)

    idx_path = prefix + ".index"
    raw = bytearray(open(idx_path, "rb").read())
    raw[5] ^= 0xFF
    open(idx_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc|magic|varint|block"):
        read_table(idx_path)


def test_find_bundle_prefix_layouts(tmp_path):
    module = tmp_path / "i3d-kinetics-400"
    prefix = module / "variables" / "variables"
    write_bundle(str(prefix), {"w": np.zeros((2,), np.float32)})
    assert find_bundle_prefix(str(module)) == str(prefix)
    assert find_bundle_prefix(str(module / "variables")) == str(prefix)
    assert find_bundle_prefix(str(prefix)) == str(prefix)
    assert find_bundle_prefix(str(prefix) + ".index") == str(prefix)
    with pytest.raises(FileNotFoundError):
        find_bundle_prefix(str(tmp_path / "nope"))


# ---------------------------------------------------------------------------
# golden cross-validation against real TensorFlow
# ---------------------------------------------------------------------------


def test_reader_against_tf_savev2(tmp_path):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    tensors = _mixed_tensors(rng)
    del tensors["net/mask"]  # TF bool encoding checked separately if needed
    prefix = str(tmp_path / "tf_written" / "variables")
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    names = sorted(tensors)
    tf.raw_ops.SaveV2(
        prefix=prefix,
        tensor_names=names,
        shape_and_slices=[""] * len(names),
        tensors=[tf.constant(tensors[n]) for n in names],
    )
    r = BundleReader(prefix)
    assert sorted(r.keys()) == names
    for name in names:
        got = r.get(name)
        assert got.dtype == tensors[name].dtype, name
        np.testing.assert_array_equal(got, tensors[name])


def test_writer_against_tf_restorev2(tmp_path):
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(4)
    tensors = {
        "a/w": rng.standard_normal((4, 5)).astype(np.float32),
        "a/b": rng.standard_normal((5,)).astype(np.float32),
        "step": np.int64(7).reshape(()),
    }
    prefix = str(tmp_path / "ours" / "variables")
    write_bundle(prefix, tensors)
    names = sorted(tensors)
    restored = tf.raw_ops.RestoreV2(
        prefix=prefix,
        tensor_names=names,
        shape_and_slices=[""] * len(names),
        dtypes=[tf.as_dtype(tensors[n].dtype) for n in names],
    )
    for name, got in zip(names, restored):
        np.testing.assert_array_equal(np.asarray(got), tensors[name])


# ---------------------------------------------------------------------------
# I3D variable-name mapping
# ---------------------------------------------------------------------------

_STEM_UNITS = [
    ("Conv3d_1a_7x7", 3, 64, 7),
    ("Conv3d_2b_1x1", 64, 64, 1),
    ("Conv3d_2c_3x3", 64, 192, 3),
]


def _fake_i3d_variables(rng, num_classes=400):
    """Sonnet-named I3D variables with the real architecture's shapes,
    including the Mixed_5b Branch_2 '0a_3x3' naming typo
    (convert_tf_pretrained.py:34-41)."""
    out = {}

    def unit(path, cin, cout, k, bn=True, bias=False):
        base = f"RGB/inception_i3d/{path}"
        out[f"{base}/conv_3d/w"] = rng.standard_normal(
            (k, k, k, cin, cout)
        ).astype(np.float32) * 0.05
        if bias:
            out[f"{base}/conv_3d/b"] = rng.standard_normal((cout,)).astype(
                np.float32
            )
        if bn:
            shape = (1, 1, 1, 1, cout)
            out[f"{base}/batch_norm/beta"] = rng.standard_normal(shape).astype(
                np.float32
            )
            out[f"{base}/batch_norm/moving_mean"] = rng.standard_normal(
                shape
            ).astype(np.float32)
            out[f"{base}/batch_norm/moving_variance"] = (
                rng.random(shape).astype(np.float32) * 0.5 + 0.5
            )

    for name, cin, cout, k in _STEM_UNITS:
        unit(name, cin, cout, k)

    cin = 192
    for mixed, oc in INCEPTION_CFG.items():
        # Mixed_5b/Branch_2 names its 3x3 conv '0a' upstream; everywhere
        # else the second conv is '0b'.
        b2b_name = "Conv3d_0a_3x3" if mixed == "Mixed_5b" else "Conv3d_0b_3x3"
        unit(f"{mixed}/Branch_0/Conv3d_0a_1x1", cin, oc[0], 1)
        unit(f"{mixed}/Branch_1/Conv3d_0a_1x1", cin, oc[1], 1)
        unit(f"{mixed}/Branch_1/Conv3d_0b_3x3", oc[1], oc[2], 3)
        unit(f"{mixed}/Branch_2/Conv3d_0a_1x1", cin, oc[3], 1)
        unit(f"{mixed}/Branch_2/{b2b_name}", oc[3], oc[4], 3)
        unit(f"{mixed}/Branch_3/Conv3d_0b_1x1", cin, oc[5], 1)
        cin = oc[0] + oc[2] + oc[4] + oc[5]

    unit("Logits/Conv3d_0c_1x1", cin, num_classes, 1, bn=False, bias=True)
    return out


def _tree_shapes(tree):
    return jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), tree)


def test_convert_tf_i3d_matches_flax_init(tmp_path):
    rng = np.random.default_rng(5)
    variables = _fake_i3d_variables(rng)
    converted = convert_tf_i3d(variables)

    model = InceptionI3d()
    x = jax.ShapeDtypeStruct((1, 16, 224, 224, 3), np.float32)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        {"params": ref["params"], "batch_stats": ref["batch_stats"]}
    ) == jax.tree_util.tree_structure(converted)
    ref_shapes = _tree_shapes(
        {"params": ref["params"], "batch_stats": ref["batch_stats"]}
    )
    got_shapes = _tree_shapes(
        jax.tree_util.tree_map(np.asarray, converted)
    )
    assert ref_shapes == got_shapes

    # the typo'd Mixed_5b Branch_2 3x3 landed as b2b, values preserved
    w = converted["params"]["Mixed_5b"]["b2b"]["conv3d"]["kernel"]
    np.testing.assert_array_equal(
        w, variables["RGB/inception_i3d/Mixed_5b/Branch_2/Conv3d_0a_3x3/conv_3d/w"]
    )
    # synthesized BN scale is ones (sonnet modules carry no gamma)
    np.testing.assert_array_equal(
        converted["params"]["Mixed_3b"]["b0"]["bn"]["scale"], np.ones((64,))
    )
    # forward graph traces against the converted tree (structure + shapes)
    jax.eval_shape(model.apply, converted, x)


def test_load_tf_i3d_from_module_dir(tmp_path):
    rng = np.random.default_rng(6)
    variables = _fake_i3d_variables(rng)
    module = tmp_path / "i3d-kinetics-400"
    write_bundle(str(module / "variables" / "variables"), variables)

    converted = load_tf_i3d(str(module))
    np.testing.assert_array_equal(
        converted["params"]["Conv3d_1a_7x7"]["conv3d"]["kernel"],
        variables["RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w"],
    )
    assert converted["batch_stats"]["Mixed_4f"]["b3b"]["bn"]["var"].shape == (128,)


def test_tf_and_torch_converters_agree():
    """The same weights through the TF-name path and the torch-name path
    (reference: convert_tf_pretrained.py maps TF->torch; our two converters
    map each source directly to flax) must land bit-identical trees —
    pinning the transpose ([kT,kH,kW,I,O] vs [O,I,kT,kH,kW]) and the
    sonnet-BN squeeze/ones-gamma conventions against each other."""
    from mm_diffusion_tpu.evaluation.i3d import convert_torch_i3d

    rng = np.random.default_rng(7)
    variables = _fake_i3d_variables(rng)

    sd = {}
    for name, v in variables.items():
        key = name[len("RGB/inception_i3d/") :]
        segs = key.split("/")
        leaf, kind = segs[-1], segs[-2]
        if segs[0] == "Logits":
            tpath = "logits"
        elif segs[0].startswith("Conv3d"):
            tpath = segs[0]
        else:
            br = int(segs[1].split("_")[-1])
            sub = (
                "b0"
                if br == 0
                else "b3b"
                if br == 3
                else f"b{br}" + ("a" if segs[2].endswith("1x1") else "b")
            )
            tpath = f"{segs[0]}.{sub}"
        if kind == "conv_3d":
            if leaf == "w":
                sd[f"{tpath}.conv3d.weight"] = np.transpose(v, (4, 3, 0, 1, 2))
            else:
                sd[f"{tpath}.conv3d.bias"] = v
        else:
            flat = v.reshape(-1)
            if leaf == "beta":
                sd[f"{tpath}.bn.bias"] = flat
                sd[f"{tpath}.bn.weight"] = np.ones_like(flat)
            elif leaf == "moving_mean":
                sd[f"{tpath}.bn.running_mean"] = flat
            else:
                sd[f"{tpath}.bn.running_var"] = flat

    via_tf = convert_tf_i3d(variables)
    via_torch = convert_torch_i3d(sd)
    assert jax.tree_util.tree_structure(via_tf) == jax.tree_util.tree_structure(
        via_torch
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(via_tf),
        jax.tree_util.tree_leaves_with_path(via_torch),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


def test_convert_weights_cli_i3d_tf(tmp_path):
    """tools/convert_weights.py i3d_tf <hub module dir> -> Orbax dir, and
    load_i3d reads the module dir directly (TF-free end to end)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.default_rng(8)
    variables = _fake_i3d_variables(rng)
    module = tmp_path / "i3d-kinetics-400"
    write_bundle(str(module / "variables" / "variables"), variables)
    out = str(tmp_path / "i3d_native")

    r = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "tools", "convert_weights.py"),
            "i3d_tf",
            str(module),
            out,
        ],
        capture_output=True,
        text=True,
        cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    import json

    with open(os.path.join(out, "CONVERSION.json")) as f:
        manifest = json.load(f)
    assert manifest["kind"] == "i3d_tf"
    assert manifest["census"]["n_params"] > 10_000_000

    from mm_diffusion_tpu.evaluation.i3d import load_i3d

    _, via_module = load_i3d(str(module))
    _, via_native = load_i3d(out)
    flat_m = jax.tree_util.tree_leaves_with_path(via_module)
    flat_n = dict(jax.tree_util.tree_leaves_with_path(via_native))
    assert len(flat_m) == len(flat_n)
    for path, arr in flat_m:
        np.testing.assert_array_equal(
            np.asarray(arr), np.asarray(flat_n[path]), err_msg=str(path)
        )


def test_convert_rejects_unknown_names():
    with pytest.raises(ValueError):
        convert_tf_i3d({"RGB/inception_i3d/Oddball_9z/conv_3d/w": np.zeros((1,))})
