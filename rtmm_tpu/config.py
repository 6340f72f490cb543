"""Render configuration.

The reference hard-codes all render/shading parameters as shader constants
(/root/reference/shaders/closesthit.hlsl:1-9, shaders/raygen.hlsl:35-36,
src/application.cpp:41-42). Here they are surfaced as a dataclass with the
reference values as defaults, so benchmarks and tests can tune them without
recompiling shaders.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Window / dispatch size (src/application.cpp:41 — 1024x1024 window).
    width: int = 1024
    height: int = 1024

    # Camera (src/application.cpp:42 — perspective(radians(80), aspect, 0.1, 1000)).
    fov_y_degrees: float = 80.0
    near: float = 0.1
    far: float = 1000.0

    # Ray extents (shaders/raygen.hlsl:35-36).
    t_min: float = 0.001
    t_max: float = 10000.0

    # Miss/background color (shaders/miss.hlsl:7).
    background: tuple[float, float, float] = (0.29, 0.29, 0.29)

    # PBR material + lights (shaders/closesthit.hlsl:1-9).
    shading_weight: float = 1.0
    metallic: float = 0.25
    roughness: float = 0.45
    ambient_occlusion: float = 0.1
    mesh_color: tuple[float, float, float] = (0.51, 0.62, 0.82)
    light_color: tuple[float, float, float] = (1.0, 1.0, 1.0)
    light_intensity: float = 22.0

    # Wavefront pipeline tuning (no reference analog — the reference relies on
    # hardware TLAS traversal; we gather per-ray candidate base triangles).
    pipeline: str = "auto"        # "ray" | "tile" | "pallas" | "auto"
    max_candidates: int = 8       # "ray" path: top-K candidates per ray
    ray_chunk: int = 16384        # "ray" path: rays per jitted chunk
    # Tiled paths: windows repeat until every tile is done, so no geometry
    # is ever dropped — these only tune per-launch work granularity.
    # XLA "tile" path: clusters consumed per candidate window (window
    # capacity = clusters_per_window * 64 units).
    clusters_per_window: int = 4
    # Pallas path: per-tile cluster-list capacity per kernel launch (the
    # kernel walks clusters -> units internally; >1 launch per frame only
    # when some tile's frustum hits more clusters than this). 256 keeps
    # a 200-cluster (51k-tri) scene on the fused single-launch path:
    # measured +2.6% over the windowed fallback (v5e, 1080p).
    kernel_clusters_per_window: int = 256
    # Sub-cones per 8x128 tile for the kernel's per-unit cull (must divide
    # 128). 4 wins for coherent primary frames; 8 wins (~14%) on
    # silhouette-heavy secondary-ray frames and costs primaries ~5% — the
    # path tracer (bench config 5) sets 8. Measured on v5e; see PERF.md.
    sub_frusta: int = 4
    # Rows in the sub-cone grid (1 = vertical strips; 2 with sub_frusta=8
    # gives squarer 4x32-px cones). Must divide sub_frusta and the 8-px
    # tile height.
    sub_rows: int = 1
    # Pallas path: tiles traced per grid program (amortizes per-program
    # overhead over the ~85% empty tiles of a typical frame).
    tiles_per_block: int = 8
    # MT matmul precision in the trace kernel. "fast3": 3-pass bf16 hi/lo
    # emulation (~17-bit products) — ample for ordinary scenes. "highest":
    # true f32 (6-pass) — REQUIRED when micro-triangles are tiny relative
    # to the scene (u_num/v_num cancel ~log2(scene/unit) bits of the
    # apex-sized partial products; at 10^6-triangle scenes fast3's u/v are
    # pure noise and the image is wrong). "auto" resolves per scene at
    # renderer construction (pallas_tiled.resolve_mt_precision): highest
    # when median unit diagonal < scene diagonal / 64.
    mt_precision: str = "auto"
    # Fused single-window mode: generate primary rays INSIDE the kernel
    # from the inv-view-proj scalars (per nonempty tile, ~45 VPU ops)
    # instead of building and streaming the 66 MB/1080p ray-matrix table
    # through HBM. Windowed/instanced/path-trace paths always take the
    # ray-matrix input (their rays are not camera-projective).
    kernel_raygen: bool = True
    tile_chunk: int = 256         # "tile" path: tiles per lax.map step
    # Two-level instanced path: per-instance tile compaction cap. Each
    # instance traces only the tiles whose frustum sees it (gather ->
    # trace -> scatter-min), bounding per-instance cost by its screen
    # footprint instead of the frame size; an instance seen by more tiles
    # than the cap falls back to the full tile grid (exact either way).
    # 0 = auto (n_tiles / 8, at least 4 blocks).
    instance_tile_cap: int = 0
    compute_dtype: str = "float32"
    # Sanitizer mode (utils/debug.py, the D3D12-debug-layer analog): guard
    # the intentionally-unguarded Möller-Trumbore reciprocal so a checkify
    # float-checks render stays NaN/Inf-free on clean scenes and only real
    # data corruption fires. Production paths keep the unguarded epilogue
    # (the acceptance window rejects the Inf/NaN lanes; one fewer VPU pass).
    debug_guards: bool = False


DEFAULT_CONFIG = RenderConfig()
