"""Smoke tests for the live debug GUI (tools/debug_gui.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _state(effect="ssgi", size=48):
    import debug_gui

    return debug_gui.GuiState("showcase", effect, size, aa=False)


class TestGuiState:
    def test_render_and_option_routing(self):
        import debug_gui

        st = _state()
        png1 = st.render_png()
        assert png1[:4] == b"\x89PNG"
        # uniform option: same effect object mutated, no rebuild
        eff_before = st.composer.effects[0]
        st.set_option("distance", 3.0)
        assert st.composer.effects[0] is eff_before
        assert st.composer.effects[0].distance == 3.0
        # static option: effect rebuilt + state reset (retrace route)
        st.set_option("steps", 4)
        assert st.composer.effects[0] is not eff_before
        assert st.composer._state is None
        png2 = st.render_png()
        assert png2[:4] == b"\x89PNG"

    def test_output_texture_inspector(self):
        st = _state()
        st.set_option("output_texture", "denoised_diffuse")
        png = st.render_png()
        assert png[:4] == b"\x89PNG"

    def test_hbao_effect(self):
        st = _state(effect="hbao")
        st.set_option("spp", 2)
        st.set_option("power", 3.0)
        assert st.render_png()[:4] == b"\x89PNG"

    def test_config_kwargs_reconstruct(self):
        """The copy-config kwargs rebuild an equivalent effect."""
        from realism_effects_tpu import SSGIEffect

        st = _state()
        st.set_option("distance", 5.0)
        st.set_option("steps", 6)
        eff = SSGIEffect(**{k: v for k, v in st.kwargs.items() if v != ""})
        assert eff.distance == 5.0
        assert eff.cfg.steps == 6
