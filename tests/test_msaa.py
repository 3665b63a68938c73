"""MSAA analog: supersampled-raster resolve (`EffectComposer(msaa=s)`).

The reference demo's AA switcher includes a WebGL ``multisampling: 4``
composer branch (`/root/reference/example/main.js:116-154`). TPU has no
hardware multisample resolve, so the analog is true SSAA: raster+shade
at s*s the display resolution, box-resolve the color, center-pick the
G-buffer/velocity planes the effects consume.
"""

import numpy as np
import jax.numpy as jnp

from realism_effects_tpu import (
    EffectComposer, HBAOEffect, Material, PerspectiveCamera, Scene,
    TRAAEffect, make_box, make_plane, translation,
)


def _render(msaa, effects=(), frames=1):
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.2, 0.2, 0.25, 1.0))))
    box = scene.add(make_box((1, 1, 1), Material(diffuse=(0.9, 0.9, 0.9, 1.0))))
    box.set_matrix(translation(0, 0.5, 0))
    cam = PerspectiveCamera(50, 1.0, 0.1, 100)
    cam.set_position(2.1, 1.7, 3.3)
    cam.look_at((0, 0.5, 0))
    comp = EffectComposer(scene, cam, 128, 128, msaa=msaa)
    for e in effects:
        comp.add_effect(e())
    img = None
    for _ in range(frames):
        img = comp.render(dt=1 / 60)
    return np.asarray(img), comp


def _hard_edge_steps(img):
    g = img.mean(-1)
    gx = np.abs(np.diff(g, axis=1))
    gy = np.abs(np.diff(g, axis=0))
    return int((gx > 0.3).sum() + (gy > 0.3).sum())


class TestMSAA:
    def test_output_resolution_unchanged(self):
        img, comp = _render(2)
        assert img.shape == (128, 128, 3)
        assert np.isfinite(img).all()

    def test_resolve_smooths_silhouettes(self):
        """4-sample resolve must change silhouette pixels and strictly
        reduce the count of aliased hard jumps along edges."""
        a, _ = _render(1)
        b, _ = _render(2)
        changed = (np.abs(a - b).max(-1) > 0.01).sum()
        assert changed > 50, changed  # the resolve acts on edges
        assert _hard_edge_steps(b) < _hard_edge_steps(a)
        # interiors (away from any edge) are untouched: every changed
        # pixel must sit within 1 px of a luminance discontinuity
        g = a.mean(-1)
        edge = np.zeros_like(g, bool)
        edge[:, :-1] |= np.abs(np.diff(g, axis=1)) > 0.05
        edge[:, 1:] |= np.abs(np.diff(g, axis=1)) > 0.05
        edge[:-1] |= np.abs(np.diff(g, axis=0)) > 0.05
        edge[1:] |= np.abs(np.diff(g, axis=0)) > 0.05
        near_edge = edge.copy()
        near_edge[1:] |= edge[:-1]
        near_edge[:-1] |= edge[1:]
        near_edge[:, 1:] |= edge[:, :-1]
        near_edge[:, :-1] |= edge[:, 1:]
        stray = (np.abs(a - b).max(-1) > 0.01) & ~near_edge
        assert stray.sum() == 0, stray.sum()

    def test_effects_consume_display_res_buffers(self):
        """The effect chain (incl. temporal state) runs at display res:
        a full HBAO+TRAA frame over several frames stays finite and
        correctly shaped with msaa=2."""
        img, comp = _render(2, effects=(HBAOEffect, TRAAEffect), frames=3)
        assert img.shape == (128, 128, 3)
        assert np.isfinite(img).all()
        vel = comp.state("__global__")["last_velocity"]
        assert vel.depth.shape == (128, 128)

    def test_msaa1_is_identity_path(self):
        """msaa=1 must be byte-identical to the default composer (no
        resolve code in the program)."""
        a, _ = _render(1)
        scene = Scene()
        scene.add(make_plane(20, Material(diffuse=(0.2, 0.2, 0.25, 1.0))))
        box = scene.add(
            make_box((1, 1, 1), Material(diffuse=(0.9, 0.9, 0.9, 1.0))))
        box.set_matrix(translation(0, 0.5, 0))
        cam = PerspectiveCamera(50, 1.0, 0.1, 100)
        cam.set_position(2.1, 1.7, 3.3)
        cam.look_at((0, 0.5, 0))
        comp = EffectComposer(scene, cam, 128, 128)
        b = np.asarray(comp.render(dt=1 / 60))
        np.testing.assert_array_equal(a, b)
