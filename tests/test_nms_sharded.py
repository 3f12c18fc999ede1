"""The Pallas NMS kernel under a data-parallel mesh (VERDICT r3 #5).

``pallas_call`` has no SPMD partitioning rule of its own; the kernel wrapper
in kernels/nms_pallas.py adds one via ``custom_partitioning`` (lanes shard,
candidates replicate), so the decoder's 'auto' policy keeps the kernel under
multi-device serving. These tests run the kernel in interpret mode on the
8-virtual-device CPU mesh and pin bit-equality against the portable fixpoint
implementation (ops/nms.py) on identical sharded inputs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssd_keras_tpu import decoder as D
from ssd_keras_tpu.kernels.nms_pallas import greedy_nms_mask_batched
from ssd_keras_tpu.ops.nms import greedy_nms_mask_fixpoint
from ssd_keras_tpu.parallel import sharding as sh


def _random_lanes(l, k, seed=0):
    rng = np.random.RandomState(seed)
    xy = rng.rand(l, k, 2)
    wh = rng.rand(l, k, 2) * 0.4
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    valid = rng.rand(l, k) > 0.3
    return jnp.asarray(boxes), jnp.asarray(valid)


def test_pallas_nms_partitions_over_lane_axis():
    boxes, valid = _random_lanes(32, 16)
    ref = np.asarray(greedy_nms_mask_fixpoint(boxes, valid, 0.45, 0.0))

    mesh = sh.make_mesh()
    lane_sh = NamedSharding(mesh, P("data", None, None))
    out_sh = NamedSharding(mesh, P("data", None))
    fn = jax.jit(
        functools.partial(greedy_nms_mask_batched, iou_threshold=0.45,
                          border_delta=0.0, interpret=True),
        in_shardings=(lane_sh, NamedSharding(mesh, P("data", None))),
        out_shardings=out_sh,
    )
    out = fn(boxes, valid)
    # Result stays lane-sharded (the op partitioned; it did not gather).
    assert out.sharding.is_equivalent_to(out_sh, out.ndim)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pallas_nms_sharded_matches_unsharded_border_delta():
    boxes, valid = _random_lanes(16, 24, seed=3)
    for bd in (0.0, 1.0):
        ref = np.asarray(
            greedy_nms_mask_batched(boxes, valid, 0.5, bd, interpret=True)
        )
        mesh = sh.make_mesh()
        fn = jax.jit(
            functools.partial(greedy_nms_mask_batched, iou_threshold=0.5,
                              border_delta=bd, interpret=True),
            in_shardings=(NamedSharding(mesh, P("data", None, None)),
                          NamedSharding(mesh, P("data", None))),
        )
        np.testing.assert_array_equal(np.asarray(fn(boxes, valid)), ref)


def test_sharded_decode_with_pallas_kernel_matches_fixpoint():
    """decode_detections_fixed under a batch-sharded mesh: the Pallas path
    (interpret mode) must equal the fixpoint path element-for-element."""
    from ssd_keras_tpu.config import SSDConfig
    from ssd_keras_tpu.models import ssd_7

    cfg = SSDConfig.ssd7(n_classes=3, img_height=64, img_width=64)
    batch, n_boxes, c = 16, 340, 4
    rng = np.random.RandomState(0)
    y_pred = rng.rand(batch, n_boxes, c + 12).astype(np.float32)
    y_pred[..., :c] /= y_pred[..., :c].sum(-1, keepdims=True)
    # anchors: plausible normalized centroids + variances
    y_pred[..., -8:-6] = rng.rand(batch, n_boxes, 2)
    y_pred[..., -6:-4] = 0.1 + 0.2 * rng.rand(batch, n_boxes, 2)
    y_pred[..., -4:] = [0.1, 0.1, 0.2, 0.2]

    mesh = sh.make_mesh()
    (sp,) = sh.shard_batch((y_pred,), mesh)

    def run(impl):
        fn = jax.jit(
            functools.partial(
                D.decode_detections_fixed, confidence_thresh=0.05,
                top_k=20, nms_max_output_size=40, img_height=64,
                img_width=64, nms_impl=impl,
            ),
            in_shardings=(sh.batch_sharding(mesh),),
            out_shardings=sh.batch_sharding(mesh),
        )
        return np.asarray(fn(sp))

    np.testing.assert_array_equal(run("pallas_interpret"), run("fixpoint"))
