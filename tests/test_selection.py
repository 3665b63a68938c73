"""SSGI selection-mask tests (the camera-layers Selection analog).

Reference: with a non-empty ``SSGIEffect.selection`` the GI G-buffer is
rendered with only the selected layer (`SSGIPass.js:71-79`); unselected
objects get no GI. Here each mesh carries ``gi_exclude`` and excluded
pixels return plain scene color (per-pixel mask over ``GBuffer.mesh_id``).
"""

import numpy as np

from realism_effects_tpu.composer import EffectComposer
from realism_effects_tpu.core.camera import PerspectiveCamera
from realism_effects_tpu.effects.ssgi import SSGIEffect
from realism_effects_tpu.scene.geometry import (
    Material, make_box, make_plane, translation,
)
from realism_effects_tpu.scene.rasterizer import rasterize_gbuffer
from realism_effects_tpu.scene.scene import Scene


def _scene(exclude_box: bool):
    scene = Scene()
    scene.add(make_plane(20, Material(diffuse=(0.6, 0.6, 0.6, 1.0))))
    glow = scene.add(make_box(
        (0.2, 2.0, 3.0),
        Material(diffuse=(1.0, 0.6, 0.3, 1.0), emissive=(8.0, 3.0, 1.0)),
    ))
    glow.set_matrix(translation(-1.5, 1.0, 0))
    box = scene.add(make_box(
        (1, 1, 1), Material(diffuse=(0.8, 0.8, 0.85, 1.0))))
    box.gi_exclude = exclude_box
    box.set_matrix(translation(0.8, 0.5, 0))
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(2.5, 2.0, 4)
    cam.look_at((0, 0.5, 0))
    return scene, cam


def _render(exclude_box, with_gi=True, frames=4, hw=72):
    scene, cam = _scene(exclude_box)
    composer = EffectComposer(scene, cam, hw, hw)
    if with_gi:
        composer.add_effect(SSGIEffect(steps=8, refine_steps=2))
    img = None
    for _ in range(frames):
        img = np.asarray(composer.render(dt=1 / 60))
    # pixel ownership map for assertions
    packed = scene.pack()
    m = cam.matrices()
    gb = rasterize_gbuffer(
        packed, scene.model_matrices(), m.projection_view_matrix, hw, hw)
    return img, np.asarray(gb.mesh_id)


def test_excluded_mesh_keeps_scene_color():
    gi_img, mesh_id = _render(exclude_box=True)
    plain_img, _ = _render(exclude_box=True, with_gi=False)
    box_px = mesh_id == 2
    assert box_px.sum() > 30
    # excluded pixels bypass GI entirely -> exactly the scene color
    np.testing.assert_allclose(
        gi_img[box_px], plain_img[box_px], atol=1e-5)
    # but GI still applies elsewhere (the glowing panel bleeds onto the
    # floor): floor pixels must differ from the plain render
    floor_px = mesh_id == 0
    assert np.abs(gi_img[floor_px] - plain_img[floor_px]).max() > 0.02


def test_included_mesh_receives_gi():
    gi_img, mesh_id = _render(exclude_box=False)
    plain_img, _ = _render(exclude_box=False, with_gi=False)
    box_px = mesh_id == 2
    assert np.abs(gi_img[box_px] - plain_img[box_px]).max() > 0.02


def test_gi_mask_vector():
    scene, _ = _scene(exclude_box=True)
    np.testing.assert_array_equal(scene.gi_mask(), [1.0, 1.0, 0.0])


def _mirror_scene(box: str):
    """Mirror floor + bright emissive box standing on it, nothing behind
    the box. ``box``: "included" | "excluded" | "absent"."""
    scene = Scene()
    scene.add(make_plane(20, Material(
        diffuse=(0.9, 0.9, 0.9, 1.0), metalness=1.0, roughness=0.03)))
    if box != "absent":
        b = scene.add(make_box(
            (1.0, 2.0, 1.0),
            Material(diffuse=(1.0, 1.0, 1.0, 1.0),
                     emissive=(12.0, 12.0, 12.0))))
        b.set_matrix(translation(0, 1.0, -1.5))
        b.gi_exclude = (box == "excluded")
    cam = PerspectiveCamera(50, 1, 0.1, 100)
    cam.set_position(0, 1.2, 4.0)
    cam.look_at((0, 0.6, -1.5))
    return scene, cam


def _mirror_render(box: str, hw=96, frames=5):
    scene, cam = _mirror_scene(box)
    composer = EffectComposer(scene, cam, hw, hw)
    composer.add_effect(SSGIEffect(steps=12, refine_steps=3,
                                   denoise_mode="temporal"))
    img = None
    for _ in range(frames):
        img = np.asarray(composer.render(dt=1 / 60))
    packed = scene.pack()
    m = cam.matrices()
    gb = rasterize_gbuffer(
        packed, scene.model_matrices(), m.projection_view_matrix, hw, hw)
    return img, np.asarray(gb.mesh_id)


def test_mirror_floor_does_not_reflect_excluded_mesh():
    """Exact Selection semantics (`SSGIPass.js:71-79`): an excluded mesh
    is absent from the GI G-buffer, so SSGI rays neither hit it nor get
    occluded by it — its mirror reflection disappears entirely, not just
    its own pixels."""
    inc, mesh_id = _mirror_render("included")
    exc, _ = _mirror_render("excluded")
    absent, _ = _mirror_render("absent")
    floor = mesh_id == 0
    assert floor.sum() > 500
    # included: the bright box reflects in the mirror floor
    assert inc[floor].max() > absent[floor].max() + 0.5
    # excluded: floor GI matches the box-free scene (rays that would hit
    # the box now see background, exactly like a camera-layer re-render
    # with nothing behind the box). Exemption: pixels within 2 px of the
    # box silhouette may flip — the temporal-reproject disocclusion
    # probes read the SHARED VelocityDepthNormalPass buffer, which is not
    # layer-restricted in the reference either (`SSGIPass.js:71-79`
    # restricts only the GI G-buffer; `SSGIEffect.js` wires the common
    # velocity pass), so nearest-snap probes adjacent to the silhouette
    # legitimately see the excluded mesh's depth/normal.
    box_mask = mesh_id == 1
    near_sil = np.zeros_like(box_mask)
    for dy in (-2, -1, 0, 1, 2):
        for dx in (-2, -1, 0, 1, 2):
            near_sil |= np.roll(np.roll(box_mask, dy, 0), dx, 1)
    strict = floor & ~near_sil
    np.testing.assert_allclose(exc[strict], absent[strict], atol=2e-2)
    # silhouette ring stays bounded (no structural reflection leak)
    ring = floor & near_sil
    assert np.abs(exc[ring] - absent[ring]).max() < 0.5
    # and the excluded box's own pixels still show plain scene color
    box_px = mesh_id == 1
    assert box_px.sum() > 100
    assert exc[box_px].mean() > 1.0  # emissive box still directly visible


# ---------------------------------------------------------------------------
# selection="rerender": exact camera-layer re-render semantics
# ---------------------------------------------------------------------------

def test_face_keep_matches_scene_without_mesh():
    """The restricted raster (``face_keep``) must be pixel-identical to
    rasterizing a scene that never contained the excluded mesh — the
    literal meaning of `SSGIPass.js:74` rendering only the selected
    layer."""
    hw = 72
    scene_with, cam = _scene(exclude_box=True)
    scene_without = Scene()
    for m in scene_with.meshes[:2]:  # floor + glow, same order/ids
        scene_without.add(m)
    m4 = cam.matrices()

    packed = scene_with.pack()
    keep = np.asarray(scene_with.gi_mask())[
        np.asarray(packed.vert_mesh_id)[np.asarray(packed.faces)[:, 0]]
    ] > 0.5
    gb_keep = rasterize_gbuffer(
        packed, scene_with.model_matrices(), m4.projection_view_matrix,
        hw, hw, face_keep=np.asarray(keep))
    gb_ref = rasterize_gbuffer(
        scene_without.pack(), scene_without.model_matrices(),
        m4.projection_view_matrix, hw, hw)
    np.testing.assert_array_equal(
        np.asarray(gb_keep.depth), np.asarray(gb_ref.depth))
    np.testing.assert_array_equal(
        np.asarray(gb_keep.mesh_id), np.asarray(gb_ref.mesh_id))
    np.testing.assert_array_equal(
        np.asarray(gb_keep.diffuse), np.asarray(gb_ref.diffuse))
    np.testing.assert_array_equal(
        np.asarray(gb_keep.normal), np.asarray(gb_ref.normal))


def _render_mode(selection, frames=4, hw=72):
    scene, cam = _scene(exclude_box=True)
    composer = EffectComposer(scene, cam, hw, hw)
    composer.add_effect(
        SSGIEffect(steps=8, refine_steps=2, selection=selection))
    img = None
    for _ in range(frames):
        img = np.asarray(composer.render(dt=1 / 60))
    packed = scene.pack()
    m = cam.matrices()
    gb = rasterize_gbuffer(
        packed, scene.model_matrices(), m.projection_view_matrix, hw, hw)
    return img, np.asarray(gb.mesh_id), np.asarray(gb.depth)


def test_rerender_reveals_geometry_behind_excluded_mesh():
    """Exact reference semantics: with ``selection="rerender"`` the whole
    SSGI chain (incl. the compose depth test, `ssgi_compose.frag:28-32`)
    runs on the restricted G-buffer, so pixels of an excluded mesh with
    geometry *behind* it show that geometry's GI result (the reference's
    punch-through), not plain scene color; ``"mask"`` keeps scene color
    there (background substitute). The two modes must agree wherever the
    excluded mesh is absent."""
    mask_img, mesh_id, _ = _render_mode("mask")
    rr_img, _, _ = _render_mode("rerender")
    plain_img, _ = _render(exclude_box=True, with_gi=False)

    box_px = mesh_id == 2
    assert box_px.sum() > 30
    # mask mode: excluded pixels = plain scene color (existing contract)
    np.testing.assert_allclose(mask_img[box_px], plain_img[box_px],
                               atol=1e-5)
    # rerender mode: the floor behind the box punches through on a
    # meaningful share of the box's pixels
    diff = np.abs(rr_img[box_px] - plain_img[box_px]).max(-1)
    assert (diff > 0.05).mean() > 0.3
    # away from the excluded mesh the two modes agree (same restricted
    # inputs up to ray marches that crossed the box's footprint)
    other = mesh_id != 2
    agree = np.abs(rr_img[other] - mask_img[other]).max(-1)
    assert np.median(agree) < 2e-2
