"""Frozen TF1 GraphDef -> JAX executor (exact legacy Inception metrics).

The reference computes image IS / FID / sFID by running the frozen
``classify_image_graph_def.pb`` under TF1 (`evaluations/evaluator.py:586-614`).
`evaluation/graphdef.py` executes such frozen graphs with jax ops instead.
These tests build frozen graphs WITH REAL TENSORFLOW (constants baked in),
run the TF session as the oracle, and assert the JAX executor reproduces it:

* each tricky op in isolation (legacy BatchNormWithGlobalNormalization,
  TF-SAME AvgPool element counting, legacy ResizeBilinear grid both
  align_corners settings, Concat-axis-first);
* a mini inception-style composite graph end to end;
* the evaluator's batch-1 Reshape relaxation (``_update_shapes`` parity);
* the InceptionV3Features contract on a fake ``classify_image_graph_def``
  (ExpandDims feed, pool_3/mixed_6 fetches, biasless softmax, IS formula).

All tests skip if tensorflow is unavailable — the shipped executor itself
never imports TF.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
tf1 = tf.compat.v1

from mm_diffusion_tpu.evaluation.graphdef import (  # noqa: E402
    GraphDefExecutor,
    InceptionV3Features,
    inception_score_openai,
)


def _run_tf(graph, fetches, feeds):
    with tf1.Session(graph=graph) as sess:
        return sess.run(fetches, feeds)


def _bake_legacy_bn(graph_def, node_name, eps=1e-3, scale_after=True):
    """Modern TF refuses to CREATE BatchNormWithGlobalNormalization (removed
    in GraphDef v9) but still IMPORTS it from old-producer graphs — exactly
    how the real classify_image_graph_def.pb executes.  Rewrite the Identity
    stand-in ``node_name`` (inputs: t) into the legacy BN node reading the
    ``<node>_m/_v/_beta/_gamma`` consts, and age the producer version."""
    from tensorflow.core.framework import attr_value_pb2, types_pb2

    graph_def.versions.producer = 8
    for node in graph_def.node:
        if node.name == node_name:
            node.op = "BatchNormWithGlobalNormalization"
            t_input = node.input[0]
            del node.input[:]
            node.input.extend(
                [t_input] + [f"{node_name}_{s}" for s in ("m", "v", "beta", "gamma")]
            )
            node.ClearField("attr")
            node.attr["T"].type = types_pb2.DT_FLOAT
            node.attr["variance_epsilon"].f = eps
            node.attr["scale_after_normalization"].b = scale_after
            return graph_def
    raise AssertionError(f"node {node_name} not found")


def _import_for_oracle(graph_def):
    graph = tf1.Graph()
    with graph.as_default():
        tf1.import_graph_def(graph_def, name="")
    return graph


def _freeze(build):
    """Build ops inside a fresh TF1 graph; return (graph, serialized bytes)."""
    graph = tf1.Graph()
    with graph.as_default():
        build()
    return graph, graph.as_graph_def().SerializeToString()


def test_resize_bilinear_legacy_grid():
    rng = np.random.default_rng(0)
    img = rng.random((2, 37, 53, 3)).astype(np.float32)
    for align in (False, True):
        graph, blob = _freeze(
            lambda: tf.raw_ops.ResizeBilinear(
                images=tf1.placeholder(tf.float32, [None, None, None, 3], name="x"),
                size=tf.constant([299, 299], tf.int32),
                align_corners=align,
                name="resized",
            )
        )
        ref = _run_tf(graph, "resized:0", {"x:0": img})
        got = np.asarray(GraphDefExecutor(blob).run(["resized:0"], {"x:0": img})[0])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_avgpool_same_counts_valid_elements():
    rng = np.random.default_rng(1)
    x = rng.random((2, 11, 13, 4)).astype(np.float32)
    graph, blob = _freeze(
        lambda: tf.raw_ops.AvgPool(
            value=tf1.placeholder(tf.float32, [None, 11, 13, 4], name="x"),
            ksize=[1, 3, 3, 1],
            strides=[1, 2, 2, 1],
            padding="SAME",
            name="pool",
        )
    )
    ref = _run_tf(graph, "pool:0", {"x:0": x})
    got = np.asarray(GraphDefExecutor(blob).run(["pool:0"], {"x:0": x})[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_legacy_batch_norm_global_normalization():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 5, 8)).astype(np.float32)
    m = rng.standard_normal(8).astype(np.float32)
    v = (rng.random(8) + 0.5).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    for scale_after in (True, False):
        def build():
            xin = tf1.placeholder(tf.float32, [None, 5, 5, 8], name="x")
            for nm, val in (("m", m), ("v", v), ("beta", beta), ("gamma", gamma)):
                tf.constant(val, name=f"bn_{nm}")
            tf.raw_ops.Identity(input=xin, name="bn")

        graph = tf1.Graph()
        with graph.as_default():
            build()
        gdef = _bake_legacy_bn(
            graph.as_graph_def(), "bn", scale_after=scale_after
        )
        ref = _run_tf(_import_for_oracle(gdef), "bn:0", {"x:0": x})
        blob = gdef.SerializeToString()
        got = np.asarray(GraphDefExecutor(blob).run(["bn:0"], {"x:0": x})[0])
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _mini_inception(rng, num_classes=13):
    """A frozen inception-style composite: preprocess -> conv/bn/relu ->
    pools -> Concat (axis-first TF1 op) -> batch-1 Reshape -> MatMul ->
    Softmax, with the evaluator's node names."""
    w1 = rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.2
    w2 = rng.standard_normal((1, 1, 16, 8)).astype(np.float32) * 0.2
    m = rng.standard_normal(8).astype(np.float32)
    v = (rng.random(8) + 0.5).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    gamma = rng.standard_normal(8).astype(np.float32)
    wfc = rng.standard_normal((16, num_classes)).astype(np.float32) * 0.3

    def build():
        jpeg = tf1.placeholder(tf.float32, [31, 41, 3], name="decoded")
        x = tf.raw_ops.ExpandDims(input=jpeg, axis=tf.constant(0), name="ExpandDims")
        x = tf.raw_ops.ResizeBilinear(
            images=x, size=tf.constant([64, 64], tf.int32), name="resize"
        )
        x = tf.raw_ops.Sub(x=x, y=tf.constant(128.0), name="sub")
        x = tf.raw_ops.Mul(x=x, y=tf.constant(1.0 / 128.0), name="mul")
        x = tf.raw_ops.Conv2D(
            input=x, filter=tf.constant(w1), strides=[1, 2, 2, 1],
            padding="SAME", name="conv",
        )
        for nm, val in (("m", m), ("v", v), ("beta", beta), ("gamma", gamma)):
            tf.constant(val, name=f"bn_{nm}")
        x = tf.raw_ops.Identity(input=x, name="bn")  # -> legacy BN by surgery
        x = tf.raw_ops.Relu(features=x, name="relu")
        a = tf.raw_ops.MaxPool(
            input=x, ksize=[1, 3, 3, 1], strides=[1, 2, 2, 1],
            padding="SAME", name="maxpool",
        )
        b = tf.raw_ops.AvgPool(
            value=x, ksize=[1, 3, 3, 1], strides=[1, 2, 2, 1],
            padding="SAME", name="mixed_6/conv",
        )
        cat = tf.raw_ops.Concat(
            concat_dim=tf.constant(3), values=[a, b], name="concat"
        )
        pool = tf.raw_ops.AvgPool(
            value=cat, ksize=[1, 16, 16, 1], strides=[1, 1, 1, 1],
            padding="VALID", name="pool_3",
        )
        tf.raw_ops.Conv2D(  # dead-end branch: exercises VALID-conv pruning
            input=pool, filter=tf.constant(w2), strides=[1, 1, 1, 1],
            padding="VALID", name="proj",
        )
        # like the real graph, softmax consumes pool_3's batch-1 reshape
        flat = tf.raw_ops.Reshape(
            tensor=pool, shape=tf.constant([1, 16]), name="pool_3/_reshape"
        )
        logits = tf.raw_ops.MatMul(
            a=flat, b=tf.constant(wfc, name="softmax/weights"),
            name="softmax/logits/MatMul",
        )
        logits = tf.raw_ops.BiasAdd(
            value=logits, bias=tf.constant(np.full(num_classes, 0.5, np.float32)),
            name="softmax/logits",
        )
        tf.raw_ops.Softmax(logits=logits, name="softmax")

    graph = tf1.Graph()
    with graph.as_default():
        build()
    gdef = _bake_legacy_bn(graph.as_graph_def(), "bn")
    return _import_for_oracle(gdef), gdef.SerializeToString()


def test_mini_inception_end_to_end_and_batch_relaxation():
    rng = np.random.default_rng(3)
    graph, blob = _mini_inception(rng)
    imgs = (rng.random((3, 31, 41, 3)) * 255).astype(np.float32)

    # TF oracle is batch-1 (frozen shapes); run per-sample like the
    # evaluator does pre-_update_shapes, feeding past ExpandDims.
    ref_soft, ref_pool, ref_spatial = [], [], []
    for i in range(3):
        s, p, sp = _run_tf(
            graph,
            ["softmax:0", "pool_3:0", "mixed_6/conv:0"],
            {"ExpandDims:0": imgs[i : i + 1]},
        )
        ref_soft.append(s)
        ref_pool.append(p)
        ref_spatial.append(sp)

    # Executor runs the WHOLE batch at once through the frozen batch-1
    # graph — the Reshape relaxation (evaluator.py _update_shapes parity).
    ex = GraphDefExecutor(blob)
    soft, pool, spatial = ex.run(
        ["softmax:0", "pool_3:0", "mixed_6/conv:0"], {"ExpandDims:0": imgs}
    )
    np.testing.assert_allclose(
        np.asarray(soft), np.concatenate(ref_soft), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pool), np.concatenate(ref_pool), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(spatial), np.concatenate(ref_spatial), rtol=1e-4, atol=1e-5
    )


def test_unknown_op_raises_by_name():
    graph, blob = _freeze(
        lambda: tf.raw_ops.Erf(
            x=tf1.placeholder(tf.float32, [2], name="x"), name="erf"
        )
    )
    with pytest.raises(NotImplementedError, match="Erf"):
        GraphDefExecutor(blob).run(["erf:0"], {"x:0": np.zeros(2, np.float32)})


def test_inception_features_contract(tmp_path):
    rng = np.random.default_rng(4)
    graph, blob = _mini_inception(rng)
    pb = tmp_path / "classify_image_graph_def.pb"
    pb.write_bytes(blob)

    feats = InceptionV3Features(str(pb))
    imgs = (rng.random((5, 31, 41, 3)) * 255).astype(np.float32)
    pool, spatial = feats.features(imgs)
    assert pool.shape == (5, 16)  # flattened pool_3 (concat of two 8-ch pools)
    assert spatial.shape[0] == 5 and spatial.shape[1] % 7 == 0  # [..., :7] slice

    # softmax = acts @ W with NO bias (evaluator.py:609-614): differs from
    # the graph's own biased softmax, matches the formula exactly.
    acts = rng.random((5, 16)).astype(np.float32)
    preds = feats.softmax(acts)
    w = feats._softmax_w
    assert w.shape == (16, 13)  # pulled from softmax/logits/MatMul input 1
    logits = acts @ w
    e = np.exp(logits - logits.max(-1, keepdims=True))
    np.testing.assert_allclose(preds, e / e.sum(-1, keepdims=True), rtol=1e-5)
    np.testing.assert_allclose(preds.sum(-1), 1.0, rtol=1e-5)

    # IS: uniform predictions -> exactly 1.0; peaked class-diverse -> > 1
    uniform = np.full((10, 13), 1 / 13.0)
    assert abs(inception_score_openai(uniform) - 1.0) < 1e-6
    peaked = np.eye(13, dtype=np.float64)[np.arange(10) % 13] * 0.99 + 0.01 / 13
    assert inception_score_openai(peaked / peaked.sum(-1, keepdims=True)) > 2.0


def test_image_eval_cli_inception_protocol(tmp_path):
    """scripts/image_eval.py --inception_pb: the legacy npz-batch protocol
    end to end (compute_image_is.py:27-66 surface) over the jax executor."""
    import json

    rng = np.random.default_rng(5)
    _, blob = _mini_inception(rng)
    pb = tmp_path / "classify_image_graph_def.pb"
    pb.write_bytes(blob)
    ref = (rng.random((8, 31, 41, 3)) * 255).astype(np.uint8)
    np.savez(tmp_path / "ref.npz", arr_0=ref)
    np.savez(
        tmp_path / "sample.npz",
        arr_0=(rng.random((8, 31, 41, 3)) * 255).astype(np.uint8),
    )

    from mm_diffusion_tpu.scripts.image_eval import main

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(
            [
                str(tmp_path / "ref.npz"),
                str(tmp_path / "sample.npz"),
                "--inception_pb",
                str(pb),
                "--output_dir",
                str(tmp_path / "out"),
                "--batch_size",
                "4",
            ]
        )
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert metrics["protocol"] == "openai"
    assert metrics["image_embedder"] == "inception_v3_tf1"
    for key in ("inception_score", "fid", "sfid", "kid", "precision", "recall"):
        assert np.isfinite(metrics[key]), (key, metrics)
    assert metrics["inception_score"] >= 1.0
    # identical sets -> FID/sFID ~ 0
    with contextlib.redirect_stdout(io.StringIO()) as buf2:
        main(
            [
                str(tmp_path / "ref.npz"),
                str(tmp_path / "ref.npz"),
                "--inception_pb",
                str(pb),
                "--output_dir",
                str(tmp_path / "out2"),
            ]
        )
    same = json.loads(buf2.getvalue().strip().splitlines()[-1])
    assert abs(same["fid"]) < 1e-3 and abs(same["sfid"]) < 1e-3
