"""Scene loading tests: the shipped reference scenes must load unmodified
(SURVEY.md §2.3 schema; scene.c parity)."""

import os

import numpy as np
import pytest

from c_raytracer_tpu.scene import load_scene
from c_raytracer_tpu.scene import types as T
from c_raytracer_tpu.scene.loader import SceneError
from c_raytracer_tpu.scene.scale import norm_scale_factor, scene_scale


def scene_path(reference_root, name):
    return os.path.join(reference_root, "scenes", name)


class TestLoadReferenceScenes:
    def test_scene1(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene1.json"))
        st = sc.static
        assert st.n_spheres == 4 and st.n_planes == 1 and st.n_triangles == 0
        # emitter: the 5th object (material id 4, ke=1)
        assert st.emitter_prims == (3,)  # sphere global ids 0..3; emitter is 4th sphere
        assert st.num_lights[3] == 200
        np.testing.assert_allclose(np.asarray(sc.params.ambient), [0.1] * 3)
        # explicit epsilon honored (scene1.json: 0.0008 on first sphere)
        assert st.epsilon[0] == pytest.approx(0.0008)
        # plane: normalized normal, d = n·p (object.c:457-466)
        np.testing.assert_allclose(
            np.asarray(sc.params.plane_normal[0]), [0, 1, 0])
        assert float(sc.params.plane_d[0]) == 0.0
        # camera vector_y normalized, not orthogonalized (camera.c:29-32)
        vy = np.asarray(sc.params.camera.vector_y)
        np.testing.assert_allclose(np.linalg.norm(vy), 1.0, rtol=1e-6)

    def test_scene2_textures(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene2.json"))
        assert T.TEX_NOISY_PERIODIC in sc.static.tex_type

    def test_scene3(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene3.json"))
        assert sc.static.n_spheres == 3 and sc.static.n_planes == 6
        assert any(sc.static.is_transparent)

    def test_scene4_meshes(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene4.json"),
                        mesh_root=reference_root)
        # 12 meshes incl. 9438-tri teapot (BASELINE.md)
        assert sc.static.n_triangles > 9000
        assert sc.static.n_spheres == 1 and sc.static.n_planes == 1

    def test_auto_epsilon_rules(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene4.json"),
                        mesh_root=reference_root)
        st = sc.static
        # triangle auto-eps = 0.003 * area^0.75 (object.c:336-339): positive,
        # small
        tri_eps = st.epsilon[st.n_spheres:st.n_spheres + st.n_triangles]
        assert all(0 < e < 1 for e in tri_eps)

    def test_missing_material_id(self, tmp_path, reference_root):
        import json
        doc = json.load(open(scene_path(reference_root, "scene1.json")))
        doc["Objects"][0]["parameters"]["material"] = 999
        p = tmp_path / "bad.json"
        p.write_text(json.dumps(doc))
        with pytest.raises(SceneError, match=r"material id \[999\]"):
            load_scene(str(p))

    def test_no_emitters_fatal(self, tmp_path, reference_root):
        import json
        doc = json.load(open(scene_path(reference_root, "scene1.json")))
        for m in doc["Materials"]:
            m["ke"] = [0.0, 0.0, 0.0]
        p = tmp_path / "dark.json"
        p.write_text(json.dumps(doc))
        with pytest.raises(SceneError, match="emittant"):
            load_scene(str(p))

    def test_bool_rejected_for_typed_tokens(self, tmp_path, reference_root):
        """JSON true/false must not satisfy a Number token (cJSON keeps the
        types distinct; Python bool is an int subclass)."""
        import json
        doc = json.load(open(scene_path(reference_root, "scene1.json")))
        doc["Camera"]["fov"] = True
        p = tmp_path / "boolfov.json"
        p.write_text(json.dumps(doc))
        with pytest.raises(SceneError, match=r"\[fov\]"):
            load_scene(str(p))

    def test_shipped_example_scene(self):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sc = load_scene(os.path.join(repo, "scenes", "example.json"))
        assert sc.static.emitter_prims and sc.static.n_spheres == 4
        assert any(sc.static.is_transparent)

    def test_scale_norm(self, reference_root):
        sc = load_scene(scene_path(reference_root, "scene1.json"))
        f = norm_scale_factor(sc)
        scaled = scene_scale(sc, f)
        from c_raytracer_tpu.scene.scale import bounded_extents
        mn, mx = bounded_extents(scaled)
        np.testing.assert_allclose(np.max(mx - mn), 1.0, rtol=1e-5)
        # epsilons scale too (object.c sphere_scale:287)
        assert scaled.static.epsilon[0] == pytest.approx(0.0008 * f)


class TestSTL:
    def test_roundtrip(self, tmp_path, rng):
        from c_raytracer_tpu.scene.stl import load_stl, save_stl
        tris = rng.standard_normal((17, 3, 3)).astype(np.float32)
        p = str(tmp_path / "t.stl")
        save_stl(p, tris)
        out = load_stl(p)
        np.testing.assert_allclose(out, tris, rtol=1e-6)

    def test_transform(self, tmp_path):
        from c_raytracer_tpu.scene.stl import load_stl, save_stl
        tri = np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], np.float32)
        p = str(tmp_path / "t.stl")
        save_stl(p, tri)
        # rotate pi/2 about Z: x->y, y->-x; then scale 2, translate (1,0,0)
        out = load_stl(p, position=(1, 0, 0), rotation=(0, 0, np.pi / 2),
                       scale=2.0)
        np.testing.assert_allclose(
            out[0], [[1, 2, 0], [-1, 0, 0], [1, 0, 2]], atol=1e-6)

    def test_ascii_rejected(self, tmp_path):
        from c_raytracer_tpu.scene.stl import load_stl
        p = tmp_path / "a.stl"
        p.write_bytes(b"solid foo\nendsolid foo\n" + b" " * 100)
        with pytest.raises(ValueError, match="binary"):
            load_stl(str(p))

    def test_reference_teapot(self, reference_root):
        from c_raytracer_tpu.scene.stl import load_stl
        v = load_stl(os.path.join(reference_root, "meshes/utah_teapot.stl"))
        assert v.shape == (9438, 3, 3)  # BASELINE.md teapot triangle count
