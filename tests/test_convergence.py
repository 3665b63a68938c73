"""Statistical temporal-convergence tests (SURVEY.md §4(d)).

With a static camera, temporal accumulation must average i.i.d. input
noise with variance decreasing like 1/N, and the effective sample count
``acc.a`` must follow the blend-derived growth law
(`temporal_reproject.frag:64-68`).
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.core.framebuffers import VelocityBuffer
from realism_effects_tpu.ops.temporal_reproject import (
    TemporalReprojectConfig, temporal_reproject,
)


def _setup(h=48, w=48):
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 0, 3)
    cam.look_at((0, 0, 0))
    m = cam.matrices()
    # flat geometry: constant mid depth, facing normal, zero velocity
    vel = VelocityBuffer(
        velocity=jnp.zeros((h, w, 2)),
        normal=jnp.asarray(np.tile([0.0, 0.0, 1.0], (h, w, 1)), jnp.float32),
        depth=jnp.full((h, w), 0.9, jnp.float32),
    )
    cfg = TemporalReprojectConfig(
        texture_count=1, log_transform=False, confidence_power=1.0,
        neighborhood_clamp=(False,),
    )
    return m, vel, cfg


def test_variance_decreases_like_one_over_n():
    h = w = 48
    m, vel, cfg = _setup(h, w)
    rng = np.random.default_rng(0)
    target = 0.5
    history = jnp.zeros((h, w, 4))
    errs = []
    for n in range(48):
        noise = rng.normal(target, 0.25, (h, w, 3)).astype(np.float32)
        noise = np.clip(noise, 0.0, 1.0)
        inp = jnp.asarray(np.concatenate([noise, np.ones((h, w, 1), np.float32)], -1))
        (history,) = temporal_reproject(
            [inp], [history], vel, vel, m, m, cfg,
            full_accumulate=True, keep_data=1.0,
            # kill the clamp's influence so pure averaging is tested
            neighborhood_clamp_intensity=0.0,
        )
        err = float(np.square(np.asarray(history[..., :3]) - target).mean())
        errs.append(err)
    # MSE after 48 frames must be far below frame-1 MSE, scaling ~1/N
    assert errs[-1] < errs[0] / 10.0
    # monotone-ish decay over big strides
    assert errs[40] < errs[10]


def test_effective_sample_count_growth_law():
    h = w = 16
    m, vel, cfg = _setup(h, w)
    history = jnp.zeros((h, w, 4))
    inp = jnp.asarray(np.full((h, w, 4), 0.5, np.float32))
    alphas = []
    for n in range(12):
        (history,) = temporal_reproject(
            [inp], [history], vel, vel, m, m, cfg,
            full_accumulate=True, keep_data=1.0,
            neighborhood_clamp_intensity=0.0,
        )
        alphas.append(float(np.asarray(history[..., 3]).mean()))
    # with full confidence, acc.a approximates the frame count:
    # a_{n+1} = 1/(1 - (1 - 1/(a_n+2))) - 1 = a_n + 1
    diffs = np.diff(alphas)
    assert (diffs > 0.5).all(), alphas
    assert abs(alphas[-1] - (alphas[0] + 11)) < 2.0


def test_confidence_zero_blocks_accumulation():
    """Fully disoccluded pixels must not inherit history."""
    h = w = 16
    m, vel, cfg = _setup(h, w)
    # last-frame buffer wildly different -> disocclusion everywhere
    last_vel = VelocityBuffer(
        velocity=jnp.zeros((h, w, 2)),
        normal=jnp.asarray(np.tile([1.0, 0.0, 0.0], (h, w, 1)), jnp.float32),
        depth=jnp.full((h, w), 0.2, jnp.float32),
    )
    history = jnp.full((h, w, 4), 9.0)
    inp = jnp.asarray(np.full((h, w, 4), 0.5, np.float32))
    (out,) = temporal_reproject(
        [inp], [history], vel, last_vel, m, m, cfg,
        full_accumulate=True, keep_data=1.0,
    )
    np.testing.assert_allclose(np.asarray(out[..., :3]), 0.5, atol=1e-3)
