"""S3Gaussian-style global deformation field with EMD coarse/fine decoders.

Re-design of S3Gaussian/scene/deformation.py (Deformation:18 /
deform_network:400): for every gaussian at time t,

  feat = hexplane(x, t+dt_cam)  ++  temporal_embed(t)  ++  e_i (per gaussian)
  h_c  = feature_out(feat)            (coarse: temporal grid at n=30)
  h_f  = feature_out_f(feat at x+dx_c) (fine: c2f temporal grid 30->150)
  heads (each ReLU-Linear-ReLU-Linear, W=64): dx, ds, dr, do, dshs(16x3)
  [+ optional DINO feature head for 2D-feature distillation]

composition (apply_deform, deformation.py:439-481, defaults
gaussian_options.py:182-194): x+dx_c+dx_f, s+ds_c+ds_f,
q -> normalize(q * dr_c * dr_f), o+do_c+do_f, sh+dsh_c+dsh_f; the fine pass
re-embeds the coarse-warped position (forward:484-527, apply_coarse_dx).
Per-camera learnable time offset (deformation.py:60-61, 325-328).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quat import quat_multiply, quat_normalize
from .hash_encoding import HashEncoding, create_hash_encoding, hash_encode
from .hexplane import HexPlane, hexplane_features, init_hexplane
from .mlp import Linear, linear_init
from .temporal import c2f_num_embeddings, temporal_embed


class Head(NamedTuple):
    """ReLU -> Linear(W, W) -> ReLU -> Linear(W, out)
    (deformation.py:139-143)."""
    l1: Linear
    l2: Linear

    def __call__(self, h):
        return self.l2(jax.nn.relu(self.l1(jax.nn.relu(h))))


def _head_init(key, w: int, out: int) -> Head:
    k1, k2 = jax.random.split(key)
    return Head(l1=linear_init(k1, w, w), l2=linear_init(k2, w, out))


class S3DecoderParams(NamedTuple):
    feature_out: Linear           # (feat_dim + D_t + E_g) -> W
    pos: Head
    scales: Head
    rotations: Head
    opacity: Head
    shs: Head


def _decoder_init(key, d_in: int, w: int, sh_bases: int) -> S3DecoderParams:
    ks = jax.random.split(key, 6)
    return S3DecoderParams(
        feature_out=linear_init(ks[0], d_in, w),
        pos=_head_init(ks[1], w, 3),
        scales=_head_init(ks[2], w, 3),
        rotations=_head_init(ks[3], w, 4),
        opacity=_head_init(ks[4], w, 1),
        shs=_head_init(ks[5], w, sh_bases * 3),
    )


class DinoHead(NamedTuple):
    """64 -> 64 -> 3 feature-distillation head (deformation.py:177-185)."""
    l1: Linear
    l2: Linear
    l3: Linear

    def __call__(self, h):
        return self.l3(jax.nn.relu(self.l2(jax.nn.relu(self.l1(h)))))


class S3FieldParams(NamedTuple):
    hexplane: HexPlane | None     # one backbone is set, the other None
    temporal_grid: jax.Array      # (E_max, D_t) global grid
    coarse: S3DecoderParams
    fine: S3DecoderParams
    time_offset: jax.Array        # (n_cams, 1)
    dino: DinoHead | None
    # instant-NGP 4-D (x,y,z,t) hash backbone — the reference's
    # `is_use_hash` alternative (deformation.py:30-41)
    hash: HashEncoding | None = None


class S3FieldConfig(NamedTuple):
    width: int = 64                      # net_width (gaussian_options:128)
    temporal_embedding_dim: int = 32
    gaussian_embedding_dim: int = 4
    min_embeddings: int = 30
    max_embeddings: int = 150
    c2f_temporal_iter: int = 20_000
    sh_bases: int = 16
    n_cams: int = 3
    feat_head: bool = True
    no_coarse_deform: bool = False
    no_fine_deform: bool = False
    no_time_offset: bool = False
    no_dx: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = False
    no_dshs: bool = False
    apply_coarse_dx: bool = True
    # backbone select (deformation.py:30-41 is_use_hash) + hash config
    # (gaussian_options.py:145-150)
    backbone: str = "hexplane"           # "hexplane" | "hash"
    hash_n_levels: int = 10
    hash_n_features: int = 4
    hash_base_resolution: int = 32
    hash_max_resolution: int = 8192
    hash_log2_size: int = 18
    # scene AABB for the hash path's MERF contraction (the reference's
    # set_aabb; static here so the traced field stays shape-stable)
    hash_aabb_lo: tuple = (-1.6, -1.6, -1.6)
    hash_aabb_hi: tuple = (1.6, 1.6, 1.6)
    # temporal feature-aggregation warp (deformation.py:254-296,
    # gaussian_options.py:151-153): blend the decoder hidden state with
    # features re-queried at +/- warped (time, position)
    aggregate_feature: bool = False
    aggregate_time_warp: bool = True
    aggregate_space_warp: bool = True
    aggregate_time_diff: float = 1.0


def create_s3_field(key, cfg: S3FieldConfig,
                    hex_reso=(64, 64, 64, 25), hex_dim=32,
                    multires=(1, 2, 4, 8), bounds=1.6) -> S3FieldParams:
    ks = jax.random.split(key, 5)
    hp, hsh = None, None
    if cfg.backbone == "hash":
        hsh = create_hash_encoding(
            ks[0], n_input_dims=4, n_levels=cfg.hash_n_levels,
            n_features=cfg.hash_n_features,
            base_resolution=cfg.hash_base_resolution,
            max_resolution=cfg.hash_max_resolution,
            log2_hashmap_size=cfg.hash_log2_size)
        feat_dim = hsh.out_dim
    else:
        hp = init_hexplane(ks[0], hex_reso, hex_dim, multires, bounds)
        feat_dim = hex_dim * len(multires)
    d_in = feat_dim + cfg.temporal_embedding_dim + cfg.gaussian_embedding_dim
    std = 0.01 / jnp.sqrt(jnp.asarray(cfg.temporal_embedding_dim, jnp.float32))
    return S3FieldParams(
        hexplane=hp,
        hash=hsh,
        temporal_grid=std * jax.random.normal(
            ks[1], (cfg.max_embeddings, cfg.temporal_embedding_dim)),
        coarse=_decoder_init(ks[2], d_in, cfg.width, cfg.sh_bases),
        fine=_decoder_init(ks[3], d_in, cfg.width, cfg.sh_bases),
        time_offset=jnp.zeros((cfg.n_cams, 1)),
        dino=(DinoHead(l1=linear_init(jax.random.fold_in(ks[4], 0), cfg.width, 64),
                       l2=linear_init(jax.random.fold_in(ks[4], 1), 64, 64),
                       l3=linear_init(jax.random.fold_in(ks[4], 2), 64, 3))
              if cfg.feat_head else None),
    )


class Deformed(NamedTuple):
    means: jax.Array
    scales_delta: jax.Array       # additive, log-space (pre-activation)
    quats: jax.Array
    opacity_delta: jax.Array      # additive, logit-space
    shs_delta: jax.Array          # (N, K, 3)
    dx_total: jax.Array           # for flow visualization / regs
    feat: jax.Array | None        # DINO feature render input


def _backbone_features(params: S3FieldParams, cfg: S3FieldConfig,
                       pts, t) -> jax.Array:
    """Spatio-temporal feature query: hexplane, or the 4-D hash grid on
    MERF-contracted positions (deformation.py query_hexplane:187-199)."""
    if params.hash is not None:
        from .deformgs import merf_contract
        lo = jnp.asarray(cfg.hash_aabb_lo, jnp.float32)
        hi = jnp.asarray(cfg.hash_aabb_hi, jnp.float32)
        xn = (pts - lo) / (hi - lo) * 2.0 - 1.0
        xn = (merf_contract(xn) + 2.0) / 4.0       # unbounded -> [0, 1]
        x4 = jnp.concatenate([xn, t[:, None]], axis=-1)
        return hash_encode(params.hash, x4)
    return hexplane_features(params.hexplane, pts, t)


def _decode(dec: S3DecoderParams, params: S3FieldParams, pts, t, emb,
            n_emb, cfg: S3FieldConfig):
    feat = _backbone_features(params, cfg, pts, t)
    temb = temporal_embed(params.temporal_grid, t[0], n_emb)  # (D_t,)
    temb = jnp.broadcast_to(temb[None, :], (pts.shape[0], temb.shape[0]))
    h = jnp.concatenate([feat, temb, emb], axis=-1)
    h = dec.feature_out(h)                                    # (N, W)
    return h


def _aggregate(dec: S3DecoderParams, params: S3FieldParams, pts, t, emb,
               n_emb, cfg: S3FieldConfig, h, key=None):
    """Temporal feature aggregation (deformation.py get_feature:254-296):
    re-query the decoder features at time/position warped forward and
    backward along the field's own motion, and blend
    0.5*h + 0.25*h_fwd + 0.25*h_bwd. Training draws a random warp scale
    per gaussian (`key`); eval uses the full time_diff."""
    noise = (jax.random.uniform(key, (pts.shape[0], 1)) if key is not None
             else jnp.ones((pts.shape[0], 1)))
    tw = cfg.aggregate_time_diff * noise[:, 0]
    t_fwd = jnp.clip(t + tw, 0.0, 1.0) if cfg.aggregate_time_warp else t
    t_bwd = jnp.clip(t - tw, 0.0, 1.0) if cfg.aggregate_time_warp else t
    if cfg.aggregate_space_warp:
        dx = dec.pos(h)
        pts_fwd, pts_bwd = pts + dx, pts - dx
    else:
        pts_fwd = pts_bwd = pts
    h_fwd = _decode(dec, params, pts_fwd, t_fwd, emb, n_emb, cfg)
    h_bwd = _decode(dec, params, pts_bwd, t_bwd, emb, n_emb, cfg)
    return 0.5 * h + 0.25 * h_fwd + 0.25 * h_bwd


def apply_s3_field(params: S3FieldParams, cfg: S3FieldConfig,
                   means, log_scales, quats, logit_opacities, shs,
                   embeddings, t: jax.Array, cam_no: jax.Array,
                   step: jax.Array, agg_key=None) -> Deformed:
    """Deform the full gaussian soup at scalar time t in [0,1].

    `agg_key`: PRNG key enabling the training-mode random warp scale of
    the feature-aggregation blend (cfg.aggregate_feature); None = eval
    semantics (full time_diff), matching the reference's is_train flag
    (deformation.py:261-265)."""
    n = means.shape[0]
    if not cfg.no_time_offset:
        t = t + params.time_offset[cam_no, 0]
    t_col = jnp.full((n,), t)

    zeros3 = jnp.zeros((n, 3))
    dx_c = ds_c = zeros3
    dr_c = jnp.zeros((n, 4))
    do_c = jnp.zeros((n, 1))
    dsh_c = jnp.zeros((n, cfg.sh_bases * 3))
    feat = None

    if not cfg.no_coarse_deform:
        h_c = _decode(params.coarse, params, means, t_col, embeddings,
                      cfg.min_embeddings, cfg)
        if cfg.aggregate_feature:
            h_c = _aggregate(params.coarse, params, means, t_col,
                             embeddings, cfg.min_embeddings, cfg, h_c,
                             agg_key)
        dx_c = params.coarse.pos(h_c)
        ds_c = params.coarse.scales(h_c)
        dr_c = params.coarse.rotations(h_c)
        do_c = params.coarse.opacity(h_c)
        dsh_c = params.coarse.shs(h_c)
        if params.dino is not None:
            feat = params.dino(h_c)

    pts_f = means + dx_c if (cfg.apply_coarse_dx
                             and not cfg.no_coarse_deform) else means

    dx_f = ds_f = zeros3
    dr_f = jnp.zeros((n, 4))
    do_f = jnp.zeros((n, 1))
    dsh_f = jnp.zeros((n, cfg.sh_bases * 3))
    if not cfg.no_fine_deform:
        n_fine = c2f_num_embeddings(step, cfg.min_embeddings,
                                    cfg.max_embeddings, cfg.c2f_temporal_iter)
        h_f = _decode(params.fine, params, pts_f, t_col, embeddings,
                      n_fine, cfg)
        if cfg.aggregate_feature:
            h_f = _aggregate(params.fine, params, pts_f, t_col,
                             embeddings, n_fine, cfg, h_f,
                             (jax.random.fold_in(agg_key, 1)
                              if agg_key is not None else None))
        dx_f = params.fine.pos(h_f)
        ds_f = params.fine.scales(h_f)
        dr_f = params.fine.rotations(h_f)
        do_f = params.fine.opacity(h_f)
        dsh_f = params.fine.shs(h_f)

    dx = jnp.zeros((n, 3)) if cfg.no_dx else dx_c + dx_f
    new_means = means + dx
    ds = jnp.zeros((n, 3)) if cfg.no_ds else ds_c + ds_f
    do = jnp.zeros((n, 1)) if cfg.no_do else do_c + do_f
    dsh = jnp.zeros((n, cfg.sh_bases * 3)) if cfg.no_dshs else dsh_c + dsh_f

    new_quats = quats
    if not cfg.no_dr:
        if not cfg.no_coarse_deform:
            new_quats = quat_normalize(quat_multiply(new_quats, dr_c))
        if not cfg.no_fine_deform:
            new_quats = quat_normalize(quat_multiply(new_quats, dr_f))

    return Deformed(
        means=new_means,
        scales_delta=ds,
        quats=new_quats,
        opacity_delta=do,
        shs_delta=dsh.reshape(n, cfg.sh_bases, 3),
        dx_total=dx,
        feat=feat,
    )
