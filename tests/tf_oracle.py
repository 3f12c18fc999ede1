"""Build the reference's Keras model graphs under tf_keras 2.x (TF2).

The strongest attainable substitute for the reference's ported-weights mAP
contract (/root/reference/README.md:81-87) in an environment without the
real VOC data or ported .h5 files: build the reference's OWN graph-builder
functions (models/keras_ssd300.py:31, models/keras_ssd7.py:30,
models/keras_ssd512.py:31) in genuine Keras, ``save_weights()`` a real
Keras-written .h5, and require the JAX models to reproduce y_pred from it.

The reference modules target the 2018 standalone-Keras-2 API. tf_keras 2.21
still implements that API except for:

* the ``keras.engine.topology`` module path (now ``tf_keras.layers``),
* two legacy Layer idioms inside the custom layers — assigning
  ``self.trainable_weights`` directly (keras_layer_L2Normalization.py:58)
  and reading ``x._keras_shape`` (keras_layer_AnchorBoxes.py:172), neither
  of which exists in TF2.

This harness aliases the module paths and swaps the two custom layers for
TF2-compatible stand-ins. The stand-ins change no semantics: L2Normalization
is the same ``l2_normalize * gamma`` with the same ``'{name}_gamma'``
variable name, and AnchorBoxes takes its anchor values from the reference's
own generator (ssd_input_encoder.py:420, the module the anchor unit tests
already use as the oracle), so the constants are reference-produced.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_state = {}


def setup_tf_keras():
    """Install keras->tf_keras module aliases; returns (tf_keras, tf)."""
    if "tf_keras" in _state:
        return _state["tf_keras"], _state["tf"]
    for _n, _a in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, _n):
            setattr(np, _n, _a)
    import tf_keras
    import tensorflow as tf

    sys.modules["keras"] = tf_keras
    for sub in ("models", "layers", "regularizers", "backend", "initializers"):
        sys.modules[f"keras.{sub}"] = getattr(tf_keras, sub)
    engine = types.ModuleType("keras.engine")
    topology = types.ModuleType("keras.engine.topology")
    topology.InputSpec = tf_keras.layers.InputSpec
    topology.Layer = tf_keras.layers.Layer
    engine.topology = topology
    sys.modules["keras.engine"] = engine
    sys.modules["keras.engine.topology"] = topology
    if not hasattr(tf_keras.backend, "image_dim_ordering"):
        tf_keras.backend.image_dim_ordering = lambda: (
            "tf"
            if tf_keras.backend.image_data_format() == "channels_last"
            else "th"
        )
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _state["tf_keras"] = tf_keras
    _state["tf"] = tf
    return tf_keras, tf


def _oracle_layers():
    """TF2-compatible L2Normalization / AnchorBoxes stand-ins (see module
    docstring for why the reference's own classes can't build under TF2)."""
    if "layers" in _state:
        return _state["layers"]
    tf_keras, tf = setup_tf_keras()
    from ssd_encoder_decoder.ssd_input_encoder import (
        SSDInputEncoder as RefEncoder,
    )

    class OracleL2Normalization(tf_keras.layers.Layer):
        def __init__(self, gamma_init=20, **kw):
            super().__init__(**kw)
            self.gamma_init = gamma_init

        def build(self, input_shape):
            # Same variable name old Keras produced: '{layer.name}_gamma'
            # (keras_layer_L2Normalization.py:57) — the .h5 name contract.
            self.gamma = self.add_weight(
                name=f"{self.name}_gamma",
                shape=(int(input_shape[3]),),
                initializer=tf_keras.initializers.Constant(self.gamma_init),
                trainable=True,
            )
            super().build(input_shape)

        def call(self, x):
            return tf.nn.l2_normalize(x, 3) * self.gamma

    class OracleAnchorBoxes(tf_keras.layers.Layer):
        """Anchor constants from the reference's generator, tiled per batch
        with the variances appended — the layer's documented output."""

        def __init__(self, img_height, img_width, this_scale, next_scale,
                     aspect_ratios=(0.5, 1.0, 2.0), two_boxes_for_ar1=True,
                     this_steps=None, this_offsets=None, clip_boxes=False,
                     variances=(0.1, 0.1, 0.2, 0.2), coords="centroids",
                     normalize_coords=False, **kw):
            super().__init__(**kw)
            self.img_height, self.img_width = img_height, img_width
            self.this_scale, self.next_scale = this_scale, next_scale
            self.aspect_ratios = list(aspect_ratios)
            self.two_boxes_for_ar1 = two_boxes_for_ar1
            self.this_steps, self.this_offsets = this_steps, this_offsets
            self.clip_boxes = clip_boxes
            self.variances = np.array(variances)
            self.coords = coords
            self.normalize_coords = normalize_coords

        def build(self, input_shape):
            shim = types.SimpleNamespace(
                img_height=self.img_height, img_width=self.img_width,
                two_boxes_for_ar1=self.two_boxes_for_ar1,
                clip_boxes=self.clip_boxes,
                normalize_coords=self.normalize_coords, coords=self.coords,
            )
            boxes = RefEncoder.generate_anchor_boxes_for_layer(
                shim, (int(input_shape[1]), int(input_shape[2])),
                self.aspect_ratios, self.this_scale, self.next_scale,
                this_steps=self.this_steps, this_offsets=self.this_offsets,
            )
            variances = np.zeros_like(boxes) + self.variances
            self._anchors = tf.constant(
                np.concatenate([boxes, variances], axis=-1)[None]
                .astype("float32")
            )
            super().build(input_shape)

        def call(self, x):
            return tf.tile(self._anchors, (tf.shape(x)[0], 1, 1, 1, 1))

    _state["layers"] = (OracleL2Normalization, OracleAnchorBoxes)
    return _state["layers"]


def _patched(module_name):
    """Import a reference model module and swap in the TF2 custom layers."""
    setup_tf_keras()
    import importlib

    mod = importlib.import_module(module_name)
    l2norm, anchors = _oracle_layers()
    mod.AnchorBoxes = anchors
    if hasattr(mod, "L2Normalization"):
        mod.L2Normalization = l2norm
    return mod


def build_reference_ssd300(n_classes=20, mode="training"):
    """The canonical Pascal-VOC SSD300 (keras_ssd300.py:31 defaults)."""
    mod = _patched("models.keras_ssd300")
    return mod.ssd_300(
        image_size=(300, 300, 3), n_classes=n_classes, mode=mode,
        l2_regularization=0.0005,
        scales=[0.1, 0.2, 0.37, 0.54, 0.71, 0.88, 1.05],
        aspect_ratios_per_layer=[
            [1.0, 2.0, 0.5],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5],
            [1.0, 2.0, 0.5],
        ],
        two_boxes_for_ar1=True,
        steps=[8, 16, 32, 64, 100, 300],
        offsets=[0.5] * 6,
        clip_boxes=False,
        variances=[0.1, 0.1, 0.2, 0.2],
        normalize_coords=True,
        subtract_mean=[123, 117, 104],
        swap_channels=[2, 1, 0],
    )


def build_reference_ssd512(n_classes=20, mode="training"):
    """The canonical Pascal-VOC SSD512 (keras_ssd512.py defaults)."""
    mod = _patched("models.keras_ssd512")
    return mod.ssd_512(
        image_size=(512, 512, 3), n_classes=n_classes, mode=mode,
        l2_regularization=0.0005,
        scales=[0.07, 0.15, 0.3, 0.45, 0.6, 0.75, 0.9, 1.05],
        aspect_ratios_per_layer=[
            [1.0, 2.0, 0.5],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5, 3.0, 1.0 / 3.0],
            [1.0, 2.0, 0.5],
            [1.0, 2.0, 0.5],
        ],
        two_boxes_for_ar1=True,
        steps=[8, 16, 32, 64, 128, 256, 512],
        offsets=[0.5] * 7,
        clip_boxes=False,
        variances=[0.1, 0.1, 0.2, 0.2],
        normalize_coords=True,
        subtract_mean=[123, 117, 104],
        swap_channels=[2, 1, 0],
    )


def build_reference_ssd7(n_classes=5, img_height=300, img_width=480,
                         mode="training"):
    """SSD7 with the ssd7_training.ipynb preset (matches SSDConfig.ssd7)."""
    mod = _patched("models.keras_ssd7")
    return mod.build_model(
        image_size=(img_height, img_width, 3), n_classes=n_classes,
        mode=mode, l2_regularization=0.0005,
        scales=[0.08, 0.16, 0.32, 0.64, 0.96],
        aspect_ratios_global=[0.5, 1.0, 2.0],
        aspect_ratios_per_layer=None,
        two_boxes_for_ar1=True,
        steps=None, offsets=None, clip_boxes=False,
        variances=[1.0, 1.0, 1.0, 1.0],
        normalize_coords=True,
        subtract_mean=[127.5, 127.5, 127.5],
        divide_by_stddev=[127.5, 127.5, 127.5],
    )
