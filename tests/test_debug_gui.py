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


class TestHttpRoundTrip:
    def test_server_endpoints(self):
        """Full HTTP round trip: /state, /set (uniform + static),
        /advance, /config against a live server on a random port."""
        import json
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        import debug_gui

        state = debug_gui.GuiState("showcase", "hbao", 40, aa=False)
        server = ThreadingHTTPServer(("127.0.0.1", 0),
                                     debug_gui.make_handler(state))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            def api(path, body=None):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    data=json.dumps(body).encode() if body else None,
                    method="POST" if body else "GET")
                return json.loads(urllib.request.urlopen(
                    req, timeout=300).read())

            s = api("/state")
            assert s["effect"] == "hbao" and s["png"]
            r = api("/set", {"name": "power", "value": 3.0})
            assert "power=3.0" in r["config"]
            r = api("/set", {"name": "spp", "value": 2})
            assert "retraced" in r["note"]
            assert api("/advance", {"frames": 2})["png"]
            assert api("/config")["kwargs"]["spp"] == 2
        finally:
            server.shutdown()
