"""Stage-2 global affine regressor.

Equivalent of model/stage2/affine_regressor.py:6-84 on NHWC similarity
volumes: conv1x1+GN+ReLU -> conv3x3/s2+GN+ReLU -> fc1/fc2 (LeakyReLU 0.1) ->
three MLP heads (translation 2, scale 1, inplane cos/sin 2 with tanh +
L2-normalize).  GroupNorm uses 32 groups; conv3x3 has no bias; everything
else defaults to biased layers, matching torch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from picopose_tpu.ops.matching import l2_normalize


def _mlp_head(x, hidden: int, out: int, name: str):
    h = nn.Dense(hidden, name=f"{name}_0")(x)
    h = nn.relu(h)
    h = nn.Dense(hidden, name=f"{name}_2")(h)
    h = nn.relu(h)
    return nn.Dense(out, name=f"{name}_4")(h)


class AffineRegressor(nn.Module):
    in_channel: int = 256
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, sim: jnp.ndarray):
        """sim: (B, 16, 16, S=256) similarity volume -> (translation (B, 2),
        scale (B,), inplane (B, 2) unit cos/sin)."""
        x = nn.Conv(self.hidden_dim, (1, 1), name="conv0")(sim)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn0")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.hidden_dim, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            name="conv1",
        )(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn1")(x)
        x = nn.relu(x)  # (B, 8, 8, hidden)

        # torch flattens NCHW (C, H, W); we flatten NHWC — torch_port permutes
        # the fc1 kernel accordingly.
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(1024, name="fc1")(x), 0.1)
        x = nn.leaky_relu(nn.Dense(256, name="fc2")(x), 0.1)

        translation = _mlp_head(x, self.hidden_dim, 2, "translation_predictor")
        scale = _mlp_head(x, self.hidden_dim, 1, "scale_predictor")[:, 0]
        inplane = jnp.tanh(_mlp_head(x, self.hidden_dim, 2, "inplane_predictor"))
        inplane = l2_normalize(inplane, axis=-1)
        return translation, scale, inplane
