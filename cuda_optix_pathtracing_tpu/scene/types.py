"""Flat SoA scene representation — the device-side scene format.

The reference uploads a padded-float4 SoA TriangleSoup + BSDF/Light arrays
(types.cuh:119-158, host_utils.cu:118-230). Our equivalent is a pytree of
jnp arrays: triangles as (v0, e0, e1) SoA, material/light parameter tables,
and the camera transforms — everything jit-traceable and shardable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.bsdf import MaterialTable, make_material_table
from ..ops.bvh import PackedBVH, build_bvh, pack_bvh, permute_tri_array
from ..ops.envmap import EnvMap, constant_envmap, make_envmap
from ..ops.lights import (
    EmissiveTable,
    LightTable,
    area_light,
    make_emissive_table,
    make_light_table,
)
from ..ops.camera import CameraConfig, camera_from_raster, world_from_camera
from ..ops.light_tree import LightTree, build_light_tree

# scenes at or above this many triangles get a BVH at build time; below it
# the brute-force tile sweep is faster than packet traversal
BVH_THRESHOLD = 512

# scenes with at least this many finite light records (point/spot rows +
# emissive triangles) get a Conty/Kulla light tree at build time; below it
# uniform 1/N selection has comparable variance and less overhead
LIGHT_TREE_THRESHOLD = 16


class Scene(NamedTuple):
    """Device scene (jit-traceable pytree).

    When ``bvh`` is present, the triangle arrays are in packed-BVH
    (leaf-major, degenerate-padded) order and ``tri_mat`` is permuted to
    match; traversal kernels and brute force both work on them.
    """

    tri_v0: jnp.ndarray  # (T,3)
    tri_e0: jnp.ndarray  # (T,3) p1 - p0
    tri_e1: jnp.ndarray  # (T,3) p2 - p0
    tri_mat: jnp.ndarray  # (T,) i32 material id
    materials: MaterialTable
    lights: LightTable  # finite lights (NEE targets)
    env: EnvMap  # environment light (constant color = 1-px-wide map)
    cam_from_raster: jnp.ndarray  # (4,4)
    world_from_cam: jnp.ndarray  # (4,4)
    bvh: Optional[PackedBVH] = None
    emissive: Optional[EmissiveTable] = None  # area-light triangle set
    light_tree: Optional[LightTree] = None  # Conty/Kulla many-lights tree
    tri_emrec: Optional[jnp.ndarray] = None  # (T,) i32 light-tree record id
    # of each (emissive) triangle, −1 for non-emitters; BVH-permuted with
    # the triangle arrays. Used for tree-PMF MIS on direct emitter hits.
    textures: Optional["TexturePool"] = None  # packed mip pool (ops/texture.py)
    tri_uv: Optional[jnp.ndarray] = None  # (T,3,2) per-corner UVs
    tri_uvdens: Optional[jnp.ndarray] = None  # (T,) ‖duv/dp‖ for cone LOD
    tri_ns: Optional[jnp.ndarray] = None  # (T,3,3) per-corner shading
    # normals (unit, mesh orientation); None = flat shading everywhere.
    # Interpolated barycentrically at hits and aligned to the incident-side
    # geometric normal (reference computeSmoothNormals + shading-normal
    # interpolation, core-trianglemesh.cpp / core-render.cpp:183-269).
    instances: Optional["InstanceTable"] = None  # when present, the
    # triangle arrays hold ONE shared base mesh in OBJECT space and the
    # renderable geometry is ∪_i M_i(mesh): rays are transformed into
    # object space per instance and traverse the shared (single) BVH —
    # N instances cost one mesh + one BVH of memory (reference Instance
    # + per-instance BVH design, core-trianglemesh.h:84-99,
    # core-bvh-builder.cpp:225-498, re-imagined as a ray-transform loop
    # instead of a TLAS: instance counts here are small and static).

    @property
    def num_triangles(self):
        return self.tri_v0.shape[0]

    @property
    def num_lights(self):
        return self.lights.ltype.shape[0]


class InstanceTable(NamedTuple):
    """Affine placements of base meshes (r5: multi-mesh).

    ``meshes[k]`` holds instance k's base-mesh tables
    ``(v0, e0, e1, nodebox, nodemeta)`` — instances of the same mesh
    reference the SAME underlying arrays, so memory stays O(distinct
    meshes); ``nodebox``/``nodemeta`` are None for brute-force meshes.
    ``tstart[k]`` maps the mesh's local (padded) triangle indices into
    the scene's concatenated global arrays (tri_mat/uv/ns gathers).
    ``bounds_lo/hi`` are per-instance WORLD AABBs — the 1-level TLAS:
    rays that miss instance k's box skip its transform+traversal
    (parked lanes). Reference: Instance{meshIdx, affine, bounds} + TLAS
    (core-trianglemesh.h:84-99, core-bvh-builder.cpp:225-498)."""

    world_from_obj: jnp.ndarray  # (I, 3, 4) affine [R|t]
    obj_from_world: jnp.ndarray  # (I, 3, 4) inverse affine
    bounds_lo: jnp.ndarray  # (I, 3) world AABB
    bounds_hi: jnp.ndarray  # (I, 3)
    tstart: jnp.ndarray  # (I,) i32 global padded-tri offset of the mesh
    meshes: tuple  # per-instance (v0, e0, e1, nodebox|None, nodemeta|None)


def _world_bounds(tris_lo, tris_hi, mats):
    """Object AABB × (I,4,4) affines → (I,3) lo/hi world AABBs."""
    corners = np.array(
        [
            [
                [tris_lo, tris_hi][ix][0],
                [tris_lo, tris_hi][iy][1],
                [tris_lo, tris_hi][iz][2],
            ]
            for ix in (0, 1)
            for iy in (0, 1)
            for iz in (0, 1)
        ],
        np.float32,
    )  # (8, 3)
    wc = (
        np.einsum("kij,cj->kci", mats[:, :3, :3], corners)
        + mats[:, None, :3, 3]
    )
    return wc.min(axis=1), wc.max(axis=1)


def make_instance_table(
    transforms, mesh_entries=None, tstart=None, bounds=None
) -> InstanceTable:
    """(I, 4, 4) world-from-object matrices (+ per-instance mesh tables)
    → table. Legacy single-mesh callers pass transforms only; the scene
    builder fills mesh tables afterwards via ``_replace``."""
    mats = np.asarray(transforms, np.float32).reshape(-1, 4, 4)
    inv = np.stack([np.linalg.inv(m) for m in mats])
    i = mats.shape[0]
    if bounds is None:
        big = np.float32(3.0e38)
        bounds = (np.full((i, 3), -big), np.full((i, 3), big))
    return InstanceTable(
        world_from_obj=jnp.asarray(mats[:, :3, :]),
        obj_from_world=jnp.asarray(inv[:, :3, :].astype(np.float32)),
        bounds_lo=jnp.asarray(np.asarray(bounds[0], np.float32)),
        bounds_hi=jnp.asarray(np.asarray(bounds[1], np.float32)),
        tstart=jnp.asarray(
            np.zeros(i, np.int32) if tstart is None else tstart
        ),
        meshes=tuple(mesh_entries) if mesh_entries is not None else (),
    )


@dataclass
class HostScene:
    """Mutable host-side scene under construction (reference
    HostTriangleScene, host_scene.cuh:26-49)."""

    triangles: list = field(default_factory=list)  # (3,3) float arrays
    tri_mat: list = field(default_factory=list)
    tri_uv: list = field(default_factory=list)  # (3,2) per-tri UVs or None
    tri_ns: list = field(default_factory=list)  # (3,3) per-corner shading
    # normals or None (flat)
    materials: list = field(default_factory=list)  # bsdf factory dicts
    lights: list = field(default_factory=list)  # light factory dicts
    textures: list = field(default_factory=list)  # (H,W,3) linear images
    env_color: tuple = (0.0, 0.0, 0.0)
    env_image: object = None  # (H,W,3) radiance array; overrides env_color
    env_rotation: object = None  # (3,3)
    camera: CameraConfig = field(default_factory=CameraConfig)
    instance_transforms: object = None  # optional (I,4,4) world-from-obj
    # placements of the (single, shared) mesh in ``triangles`` — see
    # Scene.instances. Incompatible with emissive materials/light tree.
    instance_groups: list = field(default_factory=list)  # r5 multi-mesh
    # instancing: each entry {"tris": (T,3,3), "mat": int,
    # "transforms": (K,4,4)} is a distinct base mesh placed K times;
    # ``triangles`` (baked geometry) coexists as an identity-transform
    # instance. Incompatible with emissive materials / light tree /
    # textures (see _scene_from_host_grouped).

    def add_instance_group(self, tris, mat_id: int, transforms):
        """Register a base mesh placed under K affine transforms."""
        self.instance_groups.append(
            dict(
                tris=np.asarray(tris, np.float32),
                mat=int(mat_id),
                transforms=np.asarray(transforms, np.float32).reshape(
                    -1, 4, 4
                ),
            )
        )

    def add_model(
        self,
        tris: Sequence,
        mat_id: int,
        uvs: Sequence | None = None,
        normals: Sequence | None = None,
    ):
        for i, t in enumerate(tris):
            self.triangles.append(np.asarray(t, np.float32))
            self.tri_mat.append(mat_id)
            self.tri_uv.append(
                np.asarray(uvs[i], np.float32) if uvs is not None else None
            )
            self.tri_ns.append(
                np.asarray(normals[i], np.float32)
                if normals is not None
                else None
            )

    def add_material(self, mat: dict) -> int:
        self.materials.append(mat)
        return len(self.materials) - 1

    def add_texture(self, image) -> int:
        """Register a linear-RGB image; returns its texture id."""
        self.textures.append(np.asarray(image, np.float32))
        return len(self.textures) - 1

    def add_light(self, light: dict):
        self.lights.append(light)


def scene_from_host(
    hs: HostScene,
    use_bvh: Optional[bool] = None,
    use_light_tree: Optional[bool] = None,
) -> Scene:
    if hs.instance_groups:
        return _scene_from_host_grouped(hs, use_bvh)
    tris = np.stack(hs.triangles).astype(np.float32)  # (T,3,3)
    cam = hs.camera
    lights = list(hs.lights)
    if hs.env_image is not None:
        env = make_envmap(hs.env_image, hs.env_rotation)
    else:
        env = constant_envmap(hs.env_color)

    v0 = tris[:, 0]
    e0 = tris[:, 1] - tris[:, 0]
    e1 = tris[:, 2] - tris[:, 0]
    tri_mat = np.asarray(hs.tri_mat, np.int32)

    # emissive triangles (materials with emission > 0) become ONE area
    # light row; their geometry is flattened into an EmissiveTable
    emission_by_mat = np.stack(
        [
            np.broadcast_to(np.asarray(m.get("emission", (0.0,) * 3), np.float32), (3,))
            for m in hs.materials
        ]
    ) if hs.materials else np.zeros((0, 3), np.float32)
    emissive = None
    n_emissive = 0
    em_idx_of_tri = np.full((len(tris),), -1, np.int32)
    if len(emission_by_mat) and (emission_by_mat.max() > 0):
        em_mask = emission_by_mat[tri_mat].max(axis=1) > 0
        if em_mask.any():
            emissive = make_emissive_table(
                v0[em_mask], e0[em_mask], e1[em_mask],
                emission_by_mat[tri_mat[em_mask]],
            )
            n_emissive = int(em_mask.sum())
            em_idx_of_tri[em_mask] = np.arange(n_emissive, dtype=np.int32)
            lights = lights + [area_light()]
    # NEE needs ≥1 light row; a zero-intensity point light is a no-op filler
    if not lights:
        lights = [dict(ltype=0, color=(0.0, 0.0, 0.0))]
    light_table = make_light_table(lights)

    # Conty/Kulla light tree over finite records (point/spot + emissive
    # tris) — core-light-tree-builder.cpp:306-466 capability. Count from
    # the host dicts, not the jnp table: scene_from_host may run under a
    # jit trace (tree building itself is host-only and stays off then).
    from ..ops.lights import POINT, SPOT

    n_finite = (
        sum(1 for l in lights if l.get("ltype", POINT) in (POINT, SPOT))
        + n_emissive
    )
    build_tree = (
        use_light_tree
        if use_light_tree is not None
        else n_finite >= LIGHT_TREE_THRESHOLD
    )
    light_tree = None
    tri_emrec = None
    if build_tree:
        light_tree, emissive_rec = build_light_tree(light_table, emissive)
        if light_tree is not None and n_emissive:
            # record id per triangle (−1 = not an emitter)
            tri_emrec = np.where(
                em_idx_of_tri >= 0,
                emissive_rec[np.maximum(em_idx_of_tri, 0)],
                -1,
            ).astype(np.int32)

    # texture pool + per-triangle UVs (triangles without explicit UVs get
    # a box mapping so textured materials are well-defined everywhere)
    textures = None
    tri_uv = None
    tri_uvdens = None
    if hs.textures:
        from ..ops.texture import build_texture_pool

        textures = build_texture_pool(hs.textures)
        uv_rows = []
        for i, uv in enumerate(hs.tri_uv):
            uv_rows.append(
                uv if uv is not None else box_map_uv(tris[i])
            )
        tri_uv = np.stack(uv_rows).astype(np.float32)  # (T,3,2)

    # per-corner shading normals: built when any triangle has authored
    # normals; un-authored triangles fall back to their flat face normal
    # so interpolation is a no-op there
    tri_ns = None
    ns_list = list(hs.tri_ns) + [None] * (len(tris) - len(hs.tri_ns))
    if any(n is not None for n in ns_list):
        face_n = np.cross(e0, e1)
        face_n = face_n / np.maximum(
            np.linalg.norm(face_n, axis=1, keepdims=True), 1e-20
        )
        ns_rows = [
            (
                np.asarray(n, np.float32)
                if n is not None
                else np.broadcast_to(face_n[i], (3, 3))
            )
            for i, n in enumerate(ns_list)
        ]
        tri_ns = np.stack(ns_rows).astype(np.float32)  # (T,3,3)

    bvh = None
    if use_bvh if use_bvh is not None else (len(tris) >= BVH_THRESHOLD):
        bvh = pack_bvh(build_bvh(v0, e0, e1))
        v0 = permute_tri_array(v0, bvh.perm)
        e0 = permute_tri_array(e0, bvh.perm)
        e1 = permute_tri_array(e1, bvh.perm)
        tri_mat = permute_tri_array(tri_mat, bvh.perm)
        if tri_emrec is not None:
            tri_emrec = permute_tri_array(tri_emrec, bvh.perm, pad_value=-1)
        if tri_uv is not None:
            tri_uv = permute_tri_array(tri_uv, bvh.perm)
        if tri_ns is not None:
            tri_ns = permute_tri_array(tri_ns, bvh.perm)
    if tri_uv is not None:
        from ..ops.texture import uv_density

        tri_uvdens = uv_density(
            jnp.asarray(tri_uv), jnp.asarray(e0), jnp.asarray(e1)
        )

    instances = None
    if hs.instance_transforms is not None:
        if emissive is not None or light_tree is not None:
            raise ValueError(
                "instanced scenes do not support emissive geometry / "
                "light trees (bake the transforms instead)"
            )
        v0j, e0j, e1j = jnp.asarray(v0), jnp.asarray(e0), jnp.asarray(e1)
        mesh_entry = (
            v0j, e0j, e1j,
            bvh.box if bvh is not None else None,
            bvh.meta if bvh is not None else None,
        )
        mats4 = np.asarray(hs.instance_transforms, np.float32).reshape(
            -1, 4, 4
        )
        pts = tris.reshape(-1, 3)  # original host tris (no padding rows)
        instances = make_instance_table(
            mats4,
            mesh_entries=[mesh_entry] * mats4.shape[0],
            tstart=np.zeros(mats4.shape[0], np.int32),
            bounds=_world_bounds(pts.min(0), pts.max(0), mats4),
        )

    return Scene(
        tri_v0=jnp.asarray(v0),
        tri_e0=jnp.asarray(e0),
        tri_e1=jnp.asarray(e1),
        tri_mat=jnp.asarray(tri_mat, jnp.int32),
        materials=make_material_table(hs.materials),
        lights=light_table,
        env=env,
        cam_from_raster=camera_from_raster(
            cam.focal_length_mm, cam.sensor_height_mm, cam.width, cam.height
        ),
        world_from_cam=world_from_camera(cam.direction, cam.position),
        bvh=bvh,
        emissive=emissive,
        light_tree=light_tree,
        tri_emrec=(
            jnp.asarray(tri_emrec) if tri_emrec is not None else None
        ),
        textures=textures,
        tri_uv=jnp.asarray(tri_uv) if tri_uv is not None else None,
        tri_uvdens=tri_uvdens,
        tri_ns=jnp.asarray(tri_ns) if tri_ns is not None else None,
        instances=instances,
    )


def _scene_from_host_grouped(hs: HostScene, use_bvh) -> Scene:
    """Multi-mesh instanced scene build (r5, VERDICT r4 next-4a):
    ``hs.instance_groups`` meshes + baked ``hs.triangles`` (as an
    identity-transform instance) become per-mesh BVH-reordered arrays
    CONCATENATED into the global triangle tables; the InstanceTable
    carries each instance's mesh tables (shared buffers per mesh),
    global offset and world AABB (1-level TLAS cull). Reference:
    Instance{meshIdx} + per-mesh BVHs under a TLAS
    (core-trianglemesh.h:84-146, core-bvh-builder.cpp:225-498).

    Restrictions (explicit): no emissive materials (NEE would sample
    object-space geometry), no light tree, no textures / authored
    normals on any mesh."""
    if hs.textures:
        raise ValueError("instance groups do not support textured scenes")
    if any(n is not None for n in hs.tri_ns):
        raise ValueError("instance groups do not support authored normals")
    used_mats = set(np.asarray(hs.tri_mat, np.int64).tolist()) | {
        g["mat"] for g in hs.instance_groups
    }
    for mi in used_mats:
        em = np.asarray(
            hs.materials[mi].get("emission", (0.0,) * 3), np.float32
        )
        if em.max() > 0:
            raise ValueError(
                "instanced scenes do not support emissive geometry / "
                "light trees (bake the transforms instead)"
            )

    meshes = []  # (tris (T,3,3), mat_ids (T,))
    inst = []  # (mesh_idx, (4,4))
    if hs.triangles:
        meshes.append(
            (
                np.stack(hs.triangles).astype(np.float32),
                np.asarray(hs.tri_mat, np.int32),
            )
        )
        inst.append((0, np.eye(4, dtype=np.float32)))
    for g in hs.instance_groups:
        mi = len(meshes)
        gt = np.asarray(g["tris"], np.float32)
        meshes.append((gt, np.full(len(gt), g["mat"], np.int32)))
        for m4 in np.asarray(g["transforms"], np.float32).reshape(-1, 4, 4):
            inst.append((mi, m4))

    total = sum(len(t) for t, _ in meshes)
    build = use_bvh if use_bvh is not None else total >= BVH_THRESHOLD
    mesh_tables, tstarts, obj_bounds = [], [], []
    g_v0, g_e0, g_e1, g_mat = [], [], [], []
    off = 0
    for tris, mat_ids in meshes:
        v0 = tris[:, 0]
        e0 = tris[:, 1] - tris[:, 0]
        e1 = tris[:, 2] - tris[:, 0]
        box = meta = None
        if build:
            pb = pack_bvh(build_bvh(v0, e0, e1))
            v0 = permute_tri_array(v0, pb.perm)
            e0 = permute_tri_array(e0, pb.perm)
            e1 = permute_tri_array(e1, pb.perm)
            mat_ids = permute_tri_array(mat_ids, pb.perm)
            box, meta = pb.box, pb.meta
        v0j, e0j, e1j = jnp.asarray(v0), jnp.asarray(e0), jnp.asarray(e1)
        mesh_tables.append((v0j, e0j, e1j, box, meta))
        tstarts.append(off)
        off += len(v0)
        pts = tris.reshape(-1, 3)
        obj_bounds.append((pts.min(0), pts.max(0)))
        g_v0.append(v0)
        g_e0.append(e0)
        g_e1.append(e1)
        g_mat.append(mat_ids)

    mats4 = np.stack([m for _, m in inst])
    mesh_ids = [mi for mi, _ in inst]
    blo = np.zeros((len(inst), 3), np.float32)
    bhi = np.zeros((len(inst), 3), np.float32)
    for k, mi in enumerate(mesh_ids):
        lo_k, hi_k = _world_bounds(
            obj_bounds[mi][0], obj_bounds[mi][1], mats4[k : k + 1]
        )
        blo[k], bhi[k] = lo_k[0], hi_k[0]
    instances = make_instance_table(
        mats4,
        mesh_entries=[mesh_tables[mi] for mi in mesh_ids],
        tstart=np.asarray([tstarts[mi] for mi in mesh_ids], np.int32),
        bounds=(blo, bhi),
    )

    lights = list(hs.lights) or [dict(ltype=0, color=(0.0, 0.0, 0.0))]
    env = (
        make_envmap(hs.env_image, hs.env_rotation)
        if hs.env_image is not None
        else constant_envmap(hs.env_color)
    )
    cam = hs.camera
    return Scene(
        tri_v0=jnp.concatenate([jnp.asarray(a) for a in g_v0]),
        tri_e0=jnp.concatenate([jnp.asarray(a) for a in g_e0]),
        tri_e1=jnp.concatenate([jnp.asarray(a) for a in g_e1]),
        tri_mat=jnp.concatenate(
            [jnp.asarray(a, jnp.int32) for a in g_mat]
        ),
        materials=make_material_table(hs.materials),
        lights=make_light_table(lights),
        env=env,
        cam_from_raster=camera_from_raster(
            cam.focal_length_mm, cam.sensor_height_mm, cam.width, cam.height
        ),
        world_from_cam=world_from_camera(cam.direction, cam.position),
        bvh=None,  # traversal goes through instances.meshes tables
        instances=instances,
    )


def box_map_uv(tri: np.ndarray) -> np.ndarray:
    """Auto-UV for geometry without authored UVs: project each triangle's
    vertices onto the plane of its dominant normal axis (classic box/triplanar
    mapping). One world unit = one UV tile."""
    e0 = tri[1] - tri[0]
    e1 = tri[2] - tri[0]
    n = np.abs(np.cross(e0, e1))
    axis = int(np.argmax(n))
    keep = [i for i in range(3) if i != axis]
    return tri[:, keep].astype(np.float32)
