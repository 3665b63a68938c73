"""Built-in direct-light shader extensions: GGX sun specular and
three.js-style point lights (`scene/shading.py`).

The reference consumes a pre-lit three.js render (`SSGIEffect.js:379-394`)
where MeshPhysicalMaterial provides the specular highlight and
PointLight the local lights; these are the self-contained framework's
equivalents.
"""

import numpy as np

from realism_effects_tpu import (
    EffectComposer, Material, PerspectiveCamera, Scene, make_plane,
    make_sphere, translation,
)


def _build(spec=0.0, lights=()):
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.4, 0.4, 0.45, 1.0),
                                      roughness=0.3)))
    s = scene.add(make_sphere(0.7, material=Material(
        diffuse=(0.8, 0.2, 0.15, 1.0), roughness=0.15, metalness=0.1)))
    s.set_matrix(translation(0, 0.7, 0))
    scene.sun_specular = spec
    for pl in lights:
        scene.add_point_light(**pl)
    cam = PerspectiveCamera(50, 1.0, 0.1, 100)
    cam.set_position(2.2, 1.8, 3.0)
    cam.look_at((0, 0.6, 0))
    return EffectComposer(scene, cam, 128, 128)


class TestSunSpecular:
    def test_default_off_no_new_params(self):
        """sun_specular defaults to 0 and adds no lighting keys — the
        Lambert-only program the golden fixtures pin is unchanged."""
        scene = Scene()
        assert scene.sun_specular == 0.0
        assert "sun_specular" not in scene.lighting_params()

    def test_adds_localized_highlight(self):
        base = np.asarray(_build().render(dt=1 / 60))
        spec = np.asarray(_build(spec=1.0).render(dt=1 / 60))
        assert np.isfinite(spec).all()
        delta = (spec - base).max(-1)
        # energy only added, concentrated in a small highlight
        assert (delta < -1e-5).sum() == 0
        bright = (delta > 0.5).sum()
        assert 0 < bright < 0.1 * delta.size, bright
        # peak sits on the sphere (sun at +x+y+z, camera likewise):
        # the highlight is a near-mirror HDR peak
        assert delta.max() > 5.0


class TestPointLights:
    LIGHT = dict(position=(1.5, 1.5, 1.5), color=(0.2, 0.4, 1.0),
                 intensity=6.0)

    def test_illuminates_facing_surfaces(self):
        base = np.asarray(_build().render(dt=1 / 60))
        lit = np.asarray(_build(lights=[self.LIGHT]).render(dt=1 / 60))
        assert np.isfinite(lit).all()
        delta = lit - base
        assert (delta.max(-1) < -1e-5).sum() == 0  # additive only
        # a blue light adds more blue than red
        assert delta[..., 2].max() > 2.0 * max(delta[..., 0].max(), 1e-6)
        # nothing added to background pixels (depth == 1): with no env
        # and black background they are exactly 0 in the base render
        bg = base.max(-1) == 0.0
        assert bg.sum() > 100  # the sky band exists
        assert np.abs(delta[bg]).max() < 1e-5

    def test_inverse_square_falloff(self):
        near = dict(self.LIGHT, position=(1.0, 1.0, 1.0))
        far = dict(self.LIGHT, position=(3.0, 3.0, 3.0))
        base = np.asarray(_build().render(dt=1 / 60))
        a = np.asarray(_build(lights=[near]).render(dt=1 / 60)) - base
        b = np.asarray(_build(lights=[far]).render(dt=1 / 60)) - base
        assert a.sum() > 2.0 * b.sum()

    def test_distance_cutoff_window(self):
        """three.js getDistanceAttenuation: distance > 0 windows the
        falloff to zero at the cutoff."""
        base = np.asarray(_build().render(dt=1 / 60))
        inside = dict(self.LIGHT, distance=50.0)
        outside = dict(self.LIGHT, distance=0.5)  # everything beyond
        a = np.asarray(_build(lights=[inside]).render(dt=1 / 60))
        b = np.asarray(_build(lights=[outside]).render(dt=1 / 60))
        assert (a - base).max() > 1.0
        np.testing.assert_allclose(b, base, atol=1e-5)

    def test_refresh_lighting_restages_values(self):
        """Lighting is cached on device at first render; value changes
        apply after composer.refresh_lighting() without changing the
        program structure (same key set)."""
        comp = _build(lights=[self.LIGHT])
        before = np.asarray(comp.render(dt=1 / 60))
        comp.scene.point_lights[0]["intensity"] = 0.0
        comp.refresh_lighting()
        comp.reset()
        after = np.asarray(comp.render(dt=1 / 60))
        base = np.asarray(_build().render(dt=1 / 60))
        assert not np.allclose(before, after)
        # intensity 0 == no light at all (modulo temporal frame index)
        dark = np.asarray(_build(lights=[
            dict(self.LIGHT, intensity=0.0)]).render(dt=1 / 60))
        np.testing.assert_allclose(dark, base, atol=1e-5)

    def test_multiple_lights_sum(self):
        l1 = dict(self.LIGHT, color=(1.0, 0.0, 0.0))
        l2 = dict(self.LIGHT, position=(-1.5, 1.5, 1.5),
                  color=(0.0, 1.0, 0.0))
        base = np.asarray(_build().render(dt=1 / 60))
        both = np.asarray(_build(lights=[l1, l2]).render(dt=1 / 60))
        a = np.asarray(_build(lights=[l1]).render(dt=1 / 60))
        b = np.asarray(_build(lights=[l2]).render(dt=1 / 60))
        np.testing.assert_allclose(both - base, (a - base) + (b - base),
                                   atol=1e-4)
