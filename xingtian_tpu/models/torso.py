"""Network torsos — MLP and CNN backbones.

Capability parity with the reference's ``model_utils.py`` backbone zoo
(``xt/model/model_utils.py:100-176``): the same default filter stacks for
84×84 / 42×42 / 15×15 observations, the same stride/kernel inference
fallback for other sizes, and the same default MLP geometry
([64,64] tanh — ``get_mlp_default_settings``).

TPU notes: convs and dense layers run on the MXU; activations fuse into
them under XLA.  Compute dtype is configurable — bf16 by default for conv
torsos (MXU-native), f32 for the small MLPs where parity tests care about
bit-level behavior.  uint8 pixel inputs are cast and scaled on device
(reference divides by 255 inside the keras model, ``model_utils.py:60-70``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

ACTIVATIONS: dict[str, Callable] = {
    "tanh": jnp.tanh,
    "relu": nn.relu,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "sigmoid": nn.sigmoid,
    "swish": nn.swish,
}


def get_default_filters(shape: Sequence[int]) -> list:
    """Default conv stacks per input size (``model_utils.py:120-163``)."""
    shape = list(shape)
    if len(shape) != 3:
        raise ValueError(f"no default conv architecture for obs shape {shape}")
    table = {
        (84, 84): [(32, (8, 8), (4, 4)), (32, (4, 4), (2, 2)), (64, (3, 3), (1, 1))],
        (42, 42): [(32, (4, 4), (2, 2)), (32, (4, 4), (2, 2)), (64, (3, 3), (1, 1))],
        (15, 15): [(32, (5, 5), (1, 1)), (64, (3, 3), (1, 1)), (64, (3, 3), (1, 1))],
    }
    key = tuple(shape[:2])
    if key in table:
        return table[key]
    # stride/kernel inference fallback (``model_utils.py:165-176``)
    filters = []
    input_w, input_h = shape[:2]
    flat_w = flat_h = False
    num_filters = 16
    while not (flat_w and flat_h):
        fw, sw, flat_w = _infer_stride_and_kernel(input_w, flat_w)
        fh, sh, flat_h = _infer_stride_and_kernel(input_h, flat_h)
        filters.append((num_filters, (fw, fh), (sw, sh)))
        num_filters *= 2
        input_w //= sw
        input_h //= sh
    return filters


def _infer_stride_and_kernel(size: int, flat_flag: bool) -> Tuple[int, int, bool]:
    if flat_flag or size <= 3:
        return 1, 1, True
    if size <= 8:
        return 3, 1, True
    if size <= 64:
        return 5, 2, False
    power = int(np.floor(np.log2(size)))
    stride = 2 ** power
    return 2 * stride + 1, stride, False


class MLPTorso(nn.Module):
    """Stack of Dense layers (≈ ``bulid_mlp_layers``, ``model_utils.py:80-88``)."""

    hidden_sizes: Sequence[int] = (64, 64)
    activation: str = "tanh"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = ACTIVATIONS[self.activation]
        if x.ndim > 2:  # flatten multi-dim observations to (batch, features)
            x = x.reshape(x.shape[0], -1)
        x = x.astype(self.dtype)
        for i, size in enumerate(self.hidden_sizes):
            x = nn.Dense(size, dtype=self.dtype, name=f"dense_{i}")(x)
            x = act(x)
        return x


class CNNTorso(nn.Module):
    """Conv stack + flatten + hidden dense (≈ ``bulid_conv_layers`` +
    hidden, ``model_utils.py:90-98``).  VALID padding, matching the
    reference.  uint8 inputs are normalized to [0,1] on device.
    """

    obs_shape: Sequence[int]
    hidden_sizes: Sequence[int] = (512,)
    activation: str = "relu"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = ACTIVATIONS[self.activation]
        if x.dtype == jnp.uint8:
            x = x.astype(self.dtype) / 255.0
        else:
            x = x.astype(self.dtype)
        for i, (features, kernel, stride) in enumerate(
            get_default_filters(self.obs_shape)
        ):
            x = nn.Conv(
                features, kernel_size=tuple(kernel), strides=tuple(stride),
                padding="VALID", dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = act(x)
        x = x.reshape(*x.shape[:-3], -1)
        for i, size in enumerate(self.hidden_sizes):
            x = nn.Dense(size, dtype=self.dtype, name=f"dense_{i}")(x)
            x = act(x)
        return x.astype(jnp.float32)
