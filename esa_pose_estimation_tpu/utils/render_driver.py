"""External-renderer driver for photoreal synthetic data generation.

TPU-native counterpart of the reference's Blender orchestration
(reference: lib/utils/render_utils.py:161-274 ``Renderer`` /
``YCBRenderer``): sample poses from the training-pose distribution,
prepare a background-image list, launch an external renderer process per
class with the same CLI contract the reference used
(``<exe> <blend> --background --python <backend.py> -- --input <obj>
--output_dir <dir> --bg_imgs <npy> --poses_path <npy>``), convert depth
outputs, and fan out over classes with a process pool
(render_utils.py:263-274).

Design notes vs the reference:

* The renderer executable is INJECTED (``renderer_exe``) instead of a
  hardcoded ``/home/pengsida/...`` path; when none is configured the
  driver falls back to the in-framework jitted rasterizer
  (utils/render.py — mask/depth/color), so the data-generation
  capability never depends on Blender being installed.
* Depth conversion accepts both the reference's EXR side-files (when the
  optional OpenEXR package exists) and plain ``.npy`` depth dumps (what
  our fallback backend writes); both are normalized to the reference's
  binary foreground PNG (``depth != 1`` rule, render_utils.py:211-222).
* Pose sampling reuses the framework's pose-statistics machinery
  (utils/render.sample_poses) and stores the reference layout:
  ``np.save(poses_path, concat([eulers, translations], axis=-1))``
  ((N, 6), render_utils.py:120-157).
"""

from __future__ import annotations

import glob
import os
import subprocess
from dataclasses import dataclass, field
from multiprocessing import Pool

import numpy as np

# the reference's per-dataset render intrinsics (render_utils.py:162-171)
RENDER_K = {
    'linemod': np.array([[572.4114, 0., 325.2611],
                         [0., 573.57043, 242.04899],
                         [0., 0., 1.]]),
    'blender': np.array([[700., 0., 320.],
                         [0., 700., 240.],
                         [0., 0., 1.]]),
}


def prepare_background_list(image_dir: str, out_path: str,
                            min_size: int = 500) -> list[str]:
    """Collect usable background image paths (render_utils.py:184-198:
    keep images with both sides > min_size) and save as .npy."""
    from PIL import Image

    paths = []
    for p in sorted(glob.glob(os.path.join(image_dir, '*'))):
        try:
            with Image.open(p) as img:
                w, h = img.size
        except Exception:
            continue
        if w > min_size and h > min_size:
            paths.append(p)
    os.makedirs(os.path.dirname(out_path) or '.', exist_ok=True)
    np.save(out_path, np.asarray(paths))
    return paths


def euler_to_rotmat(euler_xyz: np.ndarray) -> np.ndarray:
    """R = Rz(z) @ Ry(y) @ Rx(x) — inverse of :func:`euler_from_rotmat`."""
    x, y, z = float(euler_xyz[0]), float(euler_xyz[1]), float(euler_xyz[2])
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    cz, sz = np.cos(z), np.sin(z)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def euler_from_rotmat(Rs: np.ndarray) -> np.ndarray:
    """XYZ-intrinsic Euler angles from (N, 3, 3) rotations (the pose
    layout the Blender backend consumes)."""
    sy = np.sqrt(Rs[:, 0, 0] ** 2 + Rs[:, 1, 0] ** 2)
    singular = sy < 1e-6
    x = np.where(singular, np.arctan2(-Rs[:, 1, 2], Rs[:, 1, 1]),
                 np.arctan2(Rs[:, 2, 1], Rs[:, 2, 2]))
    y = np.arctan2(-Rs[:, 2, 0], sy)
    z = np.where(singular, 0.0, np.arctan2(Rs[:, 1, 0], Rs[:, 0, 0]))
    return np.stack([x, y, z], axis=-1)


@dataclass
class ExternalRenderer:
    """One class's render job (render_utils.py:161-261 semantics)."""
    class_type: str
    obj_path: str
    output_dir: str
    poses_path: str
    bg_imgs_path: str
    renderer_exe: str | None = None       # e.g. a blender binary
    blend_file: str = ''
    backend_script: str = ''
    n_poses: int = 100
    min_dist: float = 0.4
    max_dist: float = 1.2
    seed: int = 0
    camera_type: str = 'linemod'
    extra_args: tuple[str, ...] = field(default_factory=tuple)

    def sample_poses(self) -> np.ndarray:
        """Sample (N, 6) [euler_xyz | translation] from the pose sphere
        (render_utils.py run() step 2) and save in the reference layout."""
        from esa_pose_estimation_tpu.utils import render as render_mod

        Rs, ts = render_mod.sample_poses(self.n_poses, self.min_dist,
                                         self.max_dist, seed=self.seed)
        poses = np.concatenate(
            [euler_from_rotmat(np.asarray(Rs)), np.asarray(ts)], axis=-1)
        os.makedirs(os.path.dirname(self.poses_path) or '.', exist_ok=True)
        np.save(self.poses_path, poses)
        return poses

    def command(self) -> list[str]:
        """The reference's exact CLI contract (render_utils.py:255-257)."""
        assert self.renderer_exe, 'command() requires renderer_exe'
        cmd = [self.renderer_exe]
        if self.blend_file:
            cmd.append(self.blend_file)
        cmd += ['--background']
        if self.backend_script:
            cmd += ['--python', self.backend_script]
        cmd += ['--', '--input', self.obj_path,
                '--output_dir', self.output_dir,
                '--bg_imgs', self.bg_imgs_path,
                '--poses_path', self.poses_path]
        cmd += list(self.extra_args)
        return cmd

    def convert_depth_outputs(self) -> int:
        """Normalize depth side-files to the reference's binary
        foreground PNG (``depth != 1``, render_utils.py:206-222).
        Handles EXR (needs the optional OpenEXR package) and .npy."""
        from PIL import Image

        n = 0
        for npy in glob.glob(os.path.join(self.output_dir, '*_depth.npy')):
            dmap = np.load(npy)
            png = npy.replace('_depth.npy', '_depth.png')
            Image.fromarray(((dmap != 1).astype(np.uint8)) * 255).save(png)
            os.remove(npy)
            n += 1
        for exr in glob.glob(os.path.join(self.output_dir, '*.exr')):
            try:
                import Imath
                import OpenEXR
            except ImportError:
                break                      # leave EXRs; no converter here
            img = OpenEXR.InputFile(exr)
            dw = img.header()['dataWindow']
            w, h = dw.max.x - dw.min.x + 1, dw.max.y - dw.min.y + 1
            raw = img.channels('B', Imath.PixelType(Imath.PixelType.FLOAT))
            dmap = np.frombuffer(raw[0], np.float32).reshape(h, w)
            png = exr.replace('.png0001.exr', '.png')
            Image.fromarray(((dmap != 1).astype(np.uint8)) * 255).save(png)
            img.close()
            os.remove(exr)
            n += 1
        return n

    def run_fallback(self) -> int:
        """No external renderer: render depth-shaded color + mask with
        the in-framework jitted rasterizer (utils/render.py) — same
        output layout (<i>.png + <i>_depth.png), no Blender needed."""
        import jax.numpy as jnp
        from PIL import Image

        from esa_pose_estimation_tpu.utils import render as render_mod

        poses = np.load(self.poses_path)
        verts, faces = _load_mesh(self.obj_path)
        K = RENDER_K[self.camera_type]
        h, w = 480, 640
        os.makedirs(self.output_dir, exist_ok=True)
        vj, fj = jnp.asarray(verts), jnp.asarray(faces)
        Kj = jnp.asarray(K, jnp.float32)
        for i, pose in enumerate(poses):
            R = euler_to_rotmat(pose[:3])
            t = pose[3:6]
            mask, depth = render_mod.rasterize(vj, fj, jnp.asarray(R),
                                               jnp.asarray(t), Kj, h, w)
            mask = np.asarray(mask)
            depth = np.asarray(depth)
            zc = float(t[2])
            finite = np.where(np.isfinite(depth), depth, zc)
            shade = np.clip(1.0 - (finite - (zc - 0.2)) / 0.4, 0.0, 1.0)
            img = (shade * mask * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(self.output_dir, f'{i}.png'))
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(self.output_dir, f'{i}_depth.png'))
        return len(poses)

    def run(self) -> int:
        """Sample poses, render, convert depth (render_utils.py:243-261).
        Returns the number of rendered frames found in output_dir."""
        if not os.path.exists(self.poses_path):
            self.sample_poses()
        os.makedirs(self.output_dir, exist_ok=True)
        if self.renderer_exe:
            subprocess.run(self.command(), check=True)
            self.convert_depth_outputs()
        else:
            self.run_fallback()
        return len([p for p in glob.glob(
            os.path.join(self.output_dir, '*.png'))
            if not p.endswith('_depth.png')])


def _load_mesh(path: str):
    """Mesh loader for the fallback rasterizer: .npz with explicit
    vertices+faces, or .ply vertices triangulated by their convex hull
    (silhouette-faithful for the mask/depth outputs the DB builders
    consume; full-fidelity concave meshes should ship .npz)."""
    if path.endswith('.npz'):
        d = np.load(path)
        return d['vertices'].astype(np.float32), d['faces'].astype(np.int32)
    from scipy.spatial import ConvexHull

    from esa_pose_estimation_tpu.data.linemod import load_ply_vertices
    verts = load_ply_vertices(path).astype(np.float32)
    hull = ConvexHull(verts)
    return verts, hull.simplices.astype(np.int32)


def _run_one(job: ExternalRenderer) -> tuple[str, int]:
    return job.class_type, job.run()


def multi_render(jobs: list[ExternalRenderer],
                 processes: int = 2) -> dict[str, int]:
    """Fan render jobs over a process pool
    (render_utils.py:263-274 multi_thread_render)."""
    if len(jobs) <= 1 or processes <= 1:
        return dict(_run_one(j) for j in jobs)
    with Pool(processes=processes) as pool:
        return dict(pool.map(_run_one, jobs))
