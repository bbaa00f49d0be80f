"""Shared tiny test scene, importable from subprocess workers too."""
import numpy as np


def tiny_scene():
    from dartray_tpu.scene import build as sb, mesh
    from dartray_tpu import materials as mat_mod, lights as lt_mod

    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(0.5,) * 3))
    b.add_mesh(mesh.sphere(radius=1.0, nu=12, nv=6), m)
    b.add_mesh(mesh.make_mesh([[-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                               [-5, -1.2, 5]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(
        np.ones((4, 8, 3), np.float32) * [[[1.0, 0.8, 0.6]]]))
    return b.build()
