"""Train-step integration: losses decrease on a fixed synthetic batch.

This is the strongest hermetic signal that the whole training graph (GT
keypoints, infoNCE, affine targets, noisy-init flow supervision, AdamW) is
wired correctly: overfit one synthetic sphere pair for a few dozen steps and
watch the total loss drop.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from picopose_tpu.data.synthetic import make_pose, make_view
from picopose_tpu.models import PicoPose
from picopose_tpu.train.step import init_state, make_optimizer, train_step

SMALL = dict(vit_type="dinov2_vits14", blocks_to_take=(1, 3, 5, 7))


@pytest.mark.slow
def test_loss_decreases_on_fixed_batch():
    tem = make_view(make_pose(0.3, 0.4, z=0.45), 0.05)
    qry = make_view(make_pose(0.45, 0.52, z=0.6), 0.05)

    def to_batch(v, prefix):
        return {
            f"{prefix}_rgb": jnp.asarray(v.rgb)[None],
            f"{prefix}_mask": jnp.asarray(v.mask)[None],
            f"{prefix}_M": jnp.asarray(v.M)[None],
            f"{prefix}_K": jnp.asarray(v.K)[None],
            f"{prefix}_pose": jnp.asarray(v.pose)[None],
            f"{prefix}_full_depth": jnp.asarray(v.full_depth)[None],
        }

    batch = {**to_batch(qry, "real"), **to_batch(tem, "tem")}

    model = PicoPose(**SMALL, compute_dtype=jnp.float32)
    tx = make_optimizer(base_lr=3e-4, max_iters=10_000, warmup_iters=1)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch_size=1)

    losses0 = None
    key = jax.random.PRNGKey(42)
    history = []
    for i in range(30):
        state, losses = train_step(model, tx, state, batch, key)  # fixed key
        history.append(float(losses["loss"]))
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
    assert np.isfinite(history).all()
    # final should be clearly below initial on an overfit batch
    assert history[-1] < history[0] * 0.9, history
