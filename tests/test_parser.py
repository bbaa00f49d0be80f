"""PBRT parser + API state machine + end-to-end scene-file rendering."""
import os

import numpy as np
import pytest

from dartray_tpu.scene import parser as pp, paramset as ps, lexer as lx
from dartray_tpu.renderers import manager

SCENES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scenes")


def test_lexer_basic():
    toks = list(lx.tokenize('Shape "sphere" "float radius" [2.5] # c\nX'))
    kinds = [t.kind for t in toks]
    assert kinds == [lx.IDENT, lx.STRING, lx.STRING, lx.LBRACK, lx.NUMBER,
                     lx.RBRACK, lx.IDENT, lx.EOF]
    assert toks[4].value == 2.5


def test_paramset_types():
    p = ps.ParamSet()
    p.add("float fov", [30])
    p.add("rgb Kd", [0.5, 0.2, 0.1])
    p.add("integer indices", [0, 1, 2])
    p.add("string filename", ["x.png"])
    p.add("bool jitter", ["true"])
    assert p.find_one_float("fov") == 30.0
    assert tuple(p.find_one_spectrum("Kd")) == (0.5, 0.2, 0.1)
    assert p.find_ints("indices").tolist() == [0, 1, 2]
    assert p.find_one_string("filename") == "x.png"
    assert p.find_one_bool("jitter") is True
    assert p.report_unused() == []


def test_parse_cornell_structure():
    with open(os.path.join(SCENES, "cornell.pbrt")) as f:
        job = pp.parse(f.read())
    assert job.width == 48 and job.height == 48
    assert job.surf_integrator == "path"
    assert job.sampler.spp == 8
    scene = job.scene
    # 5 walls*2 + light*2 + 2 spheres' tris
    assert scene.geometry.n_prims > 100
    assert scene.lights.n == 1   # the area light
    assert scene.materials.n >= 4


def test_render_cornell_from_file():
    img = manager.render_pbrt(os.path.join(SCENES, "cornell.pbrt"))
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    left = img[20:28, 2:5].mean(axis=(0, 1))
    right = img[20:28, 43:46].mean(axis=(0, 1))
    assert left[0] > 1.5 * left[1]    # red wall
    assert right[1] > 1.5 * right[0]  # green wall
    assert img.mean() > 0.05


def test_render_smoke_volume():
    img = manager.render_pbrt(os.path.join(SCENES, "smoke.pbrt"))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # volume in-scattering lights up the middle of the frame above the floor
    assert img[8:20, 8:24].mean() > 0.005
    assert img.max() > 0.01


def test_transform_stack_and_instancing():
    scene_text = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
LightSource "distant" "point from" [0 0 -1] "point to" [0 0 0]
ObjectBegin "ball"
  Shape "sphere" "float radius" [0.5]
ObjectEnd
AttributeBegin
  Translate -2 0 0
  ObjectInstance "ball"
AttributeEnd
AttributeBegin
  Translate 2 0 0
  ObjectInstance "ball"
AttributeEnd
WorldEnd
"""
    job = pp.parse(scene_text)
    g = job.scene.geometry
    wb = np.asarray(g.world_bound)
    assert wb[0][0] < -2.0 and wb[1][0] > 2.0  # two instances apart
    assert job.scene.lights.n == 1


def test_include(tmp_path):
    (tmp_path / "inc.pbrt").write_text(
        'Shape "sphere" "float radius" [1.0]\n')
    main = """
Film "image" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Include "inc.pbrt"
WorldEnd
"""
    from dartray_tpu.scene import resources
    r = resources.Resolver([str(tmp_path)])
    job = pp.parse(main, resolver=r)
    assert job.scene.geometry.n_prims > 100


def test_overrides():
    with open(os.path.join(SCENES, "cornell.pbrt")) as f:
        text = f.read()
    job = pp.parse(text)
    job2 = manager.apply_overrides(job, {"resolution_scale": 0.5, "spp": 1})
    assert job2.width == 24 and job2.sampler.spp == 1


@pytest.mark.slow
def test_igi_env_fixture_renders():
    """Driver config #5 fixture: igi + environment camera + HDR envmap
    (scenes/igi-env.pbrt). The envmap must be visible (sky gradient) and
    importance-sampled light must reach the floor."""
    img = manager.render_pbrt(
        os.path.join(SCENES, "igi-env.pbrt"),
        search_paths=[SCENES],
        overrides={"resolution_scale": 0.5, "spp": 2})
    assert np.isfinite(img).all()
    assert img.mean() > 0.01          # lit by the envmap
    # environment camera: top rows see sky (blueish), bottom rows floor
    top = img[:4].mean(axis=(0, 1))
    assert top[2] > top[0]            # sky gradient is blue-dominant


@pytest.mark.slow
def test_anim_object_motion_blur_scene():
    """anim-bluespheres-class scene: ActiveTransform EndTime + Translate
    smears a moving sphere across the shutter (object motion blur)."""
    base = """
Film "image" "integer xresolution" [40] "integer yresolution" [16]
Sampler "lowdiscrepancy" "integer pixelsamples" [8]
SurfaceIntegrator "directlighting"
LookAt 0 0 -4  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "distant" "color L" [4 4 4] "point from" [0 0 -5] "point to" [0 0 0]
AttributeBegin
  Material "matte" "color Kd" [0.8 0.2 0.2]
  {anim}
  Shape "sphere" "float radius" [0.35]
AttributeEnd
WorldEnd
"""
    anim = ('ActiveTransform EndTime\n  Translate 1.2 0 0\n'
            '  ActiveTransform All')
    img_blur = manager.render_pbrt(base.format(anim=anim))
    img_stat = manager.render_pbrt(base.format(anim=""))
    cover_b = (img_blur[..., 0] > 0.05).any(axis=0).sum()
    cover_s = (img_stat[..., 0] > 0.05).any(axis=0).sum()
    assert np.isfinite(img_blur).all()
    assert cover_b > cover_s + 3, (cover_b, cover_s)   # smeared wider
