"""End-to-end asset-pipeline golden: a reference Draco GLB through the
full stack.

Pins loader (Draco decode, WebP textures, normal/MR/occlusion maps) +
rasterizer + SSGI/HBAO/TRAA against a committed fixture — the strongest
content-comparable regression available without the WebGL reference
(the reference's own QA is exactly such demo-scene frames, SURVEY §4).
"""

import os

import numpy as np
import pytest

REF = "/root/reference/example/public/gltf/flashbang_grenade.optimized.glb"
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_flashbang_96.npz")


@pytest.mark.skipif(not os.path.exists(REF), reason="reference absent")
def test_flashbang_full_stack_matches_golden():
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples"))
    from demo import build_scene

    from realism_effects_tpu import (
        EffectComposer, HBAOEffect, SSGIEffect, TRAAEffect,
    )

    scene, cam, _ = build_scene(f"asset:{REF}")
    c = EffectComposer(scene, cam, 96, 96)
    c.add_effect(SSGIEffect(steps=6, refine_steps=2))
    c.add_effect(HBAOEffect())
    c.add_effect(TRAAEffect())
    img = None
    for _ in range(5):
        img = c.render(dt=1 / 60)
    img = np.asarray(img)
    # f16 storage + early return exactly like test_golden.py (the 2e-2
    # RMSE tolerance dwarfs f16 quantization ~1e-4)
    if os.environ.get("RE_TPU_REGEN_GOLDEN") == "1" or not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(FIXTURE, image=img.astype(np.float16))
        if os.environ.get("RE_TPU_REGEN_GOLDEN") == "1":
            return
    golden = np.load(FIXTURE)["image"].astype(np.float32)
    rmse = float(np.sqrt(np.mean((img - golden) ** 2)))
    assert np.isfinite(img).all()
    assert rmse < 2e-2, f"asset golden drifted: rmse={rmse:.4f}"
