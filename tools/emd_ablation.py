"""EMD-on vs EMD-off ablation on the oracle-GT self-consistency scene.

The reference's headline claim is that the EMD motion module improves
reconstruction, most of all in vehicle regions (+1.81 dB full-scene /
+2.81 dB vehicle-region over S3Gaussian, /root/reference/index.html:708).
This gate reproduces the *mechanism* on a controlled scene: the GT
vehicle follows a track with a residual the box annotation cannot
express (yaw wobble + bounce + sway, tools/self_consistency.py
build_gt_scene(wobble=True)); both students get the SMOOTH annotation
track and identical budgets; only the EMD temporal heads
(no_apply_embed_track=False) can absorb the residual.

Writes docs/emd_ablation_r03_metrics.json with full + vehicle-masked
PSNR for both runs. Pass: EMD-on beats EMD-off on vehicle-region PSNR.

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/emd_ablation.py --steps 2500
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_multi_seed(args):
    """Drive N single-seed runs as subprocesses (fresh JAX process per
    seed — each seed shifts the GT init AND the wobble phase), then
    aggregate the on/off margins into one artifact with mean +- std and
    a margin/sigma significance ratio."""
    import subprocess

    per_seed = []
    for i in range(args.seeds):
        seed = args.seed + i
        jout = f"{args.json_out}.seed{seed}"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--steps", str(args.steps), "--mode", args.mode,
               "--width", str(args.width), "--height", str(args.height),
               "--frames", str(args.frames), "--n_bg", str(args.n_bg),
               "--n_veh", str(args.n_veh), "--n_ped", str(args.n_ped),
               "--smpl_smooth", str(args.smpl_smooth),
               "--budget", str(args.budget),
               "--out", os.path.join(args.out, f"seed{seed}"),
               "--json_out", jout, "--test_stride", str(args.test_stride),
               "--seed", str(seed), "--seeds", "1",
               "--wobble_amp", str(args.wobble_amp),
               "--wobble_period", str(args.wobble_period)] \
            + (["--freeze_body_pose"] if args.freeze_body_pose else [])
        print(f"=== seed {seed} ({i + 1}/{args.seeds}) ===", flush=True)
        subprocess.run(cmd, check=True)
        with open(jout) as f:
            per_seed.append(json.load(f))

    gate_key = ("delta_test_human_psnr" if args.mode == "smpl"
                else "delta_test_vehicle_psnr")
    deltas = np.array([r[gate_key] for r in per_seed], np.float64)
    on = np.array([r["emd_on"]["test"]["human_psnr" if args.mode == "smpl"
                                       else "vehicle_psnr"]
                   for r in per_seed])
    off = np.array([r["emd_off"]["test"]["human_psnr"
                                         if args.mode == "smpl"
                                         else "vehicle_psnr"]
                    for r in per_seed])
    std = float(deltas.std(ddof=1)) if len(deltas) > 1 else 0.0
    report = {
        "gate": f"emd_ablation_{args.mode}_multiseed",
        "seeds": [args.seed + i for i in range(args.seeds)],
        "steps": args.steps,
        "wobble_amp": args.wobble_amp,
        "wobble_period": args.wobble_period,
        "freeze_body_pose": args.freeze_body_pose,
        "margin_mean_db": round(float(deltas.mean()), 3),
        "margin_std_db": round(std, 3),
        "margin_over_sigma": (round(float(deltas.mean()) / std, 2)
                              if std > 0 else None),
        "per_seed_margin_db": [round(float(d), 3) for d in deltas],
        "emd_on_mean_db": round(float(on.mean()), 3),
        "emd_off_mean_db": round(float(off.mean()), 3),
        "pass": bool((deltas > 0).all()),
        "per_seed": per_seed,
    }
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps({k: report[k] for k in
                      ("margin_mean_db", "margin_std_db",
                       "margin_over_sigma", "per_seed_margin_db",
                       "pass")}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--n_bg", type=int, default=200_000)
    ap.add_argument("--n_veh", type=int, default=20_000)
    ap.add_argument("--n_ped", type=int, default=4000)
    ap.add_argument("--mode", choices=("vehicle", "smpl"),
                    default="vehicle",
                    help="vehicle: wobbled rigid track (EMD rigid heads); "
                         "smpl: wobbled pedestrian body joints (per-joint "
                         "EMD yaw heads, reference smpl.py:401-436)")
    ap.add_argument("--smpl_smooth", type=float, default=0.1,
                    help="w_smpl_joint_smooth for BOTH runs in smpl "
                         "mode. The default 0.01 lets the per-frame "
                         "body quats absorb the wobble before the EMD "
                         "heads see any residual (measured: EMD-on "
                         "-0.24 dB, a null result); a strong smoothness "
                         "reg penalizes per-frame jitter but NOT the "
                         "EMD offsets — the same division of labor the "
                         "rigid track's w_rigid_temporal=0.1 gives "
                         "vehicles")
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--out", default="out/emd_ablation")
    ap.add_argument("--json_out", default="docs/emd_ablation_r03_metrics.json")
    ap.add_argument("--test_stride", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0,
                    help="GT-scene seed (init geometry + noise)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="run N seeds (seed, seed+1, ...), each with a "
                         "different wobble PHASE, and report the margin "
                         "as mean +- std across seeds — a single-seed "
                         "margin below run-to-run variance proves "
                         "nothing (VERDICT r4 weak #5)")
    ap.add_argument("--wobble_amp", type=float, default=1.0,
                    help="scale the pedestrian joint-wobble amplitudes "
                         "(smpl mode): a larger unmodelled residual "
                         "gives the EMD heads more signal to explain")
    ap.add_argument("--freeze_body_pose", action="store_true",
                    help="train with the per-frame SMPL body pose FROZEN "
                         "at the annotation (lr_smpl_rotation=0) in BOTH "
                         "arms: the optimizable pose can partially absorb "
                         "the wobble in either arm (measured: margins "
                         "+0.12 / -1.0 dB at amp 1.0/1.5 — pure "
                         "confound), so freezing it makes the EMD heads "
                         "the ONLY mechanism that can express the "
                         "residual — the division the reference's "
                         "no_apply_embed_track ablation isolates")
    ap.add_argument("--wobble_period", type=float, default=3.7,
                    help="pedestrian wobble period in frames. 3.7 is "
                         "~Nyquist for the stride-8 test split (test-"
                         "frame phase unrecoverable by ANY student — "
                         "measured margins are extrapolation noise); "
                         "7.3 makes the residual interpolatable and "
                         "isolates EMD expressiveness")
    args = ap.parse_args()

    from emd_tpu.utils.compile_cache import enable as _cc
    _cc()  # persistent XLA cache: repeat/multi-seed runs skip recompiles

    import dataclasses

    from self_consistency import build_gt_scene, render_gt, to_scene_data

    from emd_tpu.data.batches import BatchSource
    from emd_tpu.eval.harness import do_evaluation
    from emd_tpu.motion.rigid import RigidConfig
    from emd_tpu.motion.smpl import SmplConfig
    from emd_tpu.scene.scene_graph import SceneConfig
    from emd_tpu.train.loop import LoopConfig, fit_scene
    from emd_tpu.train.scene_trainer import SceneTrainConfig

    if args.seeds > 1:
        run_multi_seed(args)
        return

    t0 = time.time()
    smpl_mode = args.mode == "smpl"
    params, aux, meta = build_gt_scene(
        n_bg=args.n_bg, n_veh=args.n_veh, n_frames=args.frames,
        width=args.width, height=args.height, wobble=not smpl_mode,
        n_ped=args.n_ped if smpl_mode else 0, wobble_ped=smpl_mode,
        seed=args.seed, ped_wobble_amp=args.wobble_amp,
        ped_wobble_phase=0.7 * args.seed,
        ped_wobble_period=args.wobble_period)
    print("rendering wobbled GT ...", flush=True)
    images, sky_masks, veh_masks, hum_masks, cyc_masks = render_gt(
        params, aux, meta, args.budget)
    print(f"GT rendered in {time.time() - t0:.0f}s "
          f"(veh px {veh_masks.mean():.4f}, hum px {hum_masks.mean():.4f})",
          flush=True)
    scene = to_scene_data(params, aux, meta, images, sky_masks, veh_masks,
                          hum_masks, cyc_masks)

    def run(tag: str, rigid_cfg: RigidConfig):
        out_dir = os.path.join(args.out, tag)
        os.makedirs(out_dir, exist_ok=True)
        cfg = SceneTrainConfig(scene=SceneConfig(
            budget=args.budget, rigid=rigid_cfg,
            smpl=SmplConfig(rigid=rigid_cfg)))
        if smpl_mode:
            cfg = dataclasses.replace(
                cfg, w_smpl_joint_smooth=args.smpl_smooth)
            if args.freeze_body_pose:
                cfg = dataclasses.replace(cfg, lr_smpl_rotation=0.0)
        loop = LoopConfig(
            max_steps=args.steps, refine_start=500, refine_interval=400,
            refine_stop=args.steps * 3 // 4,
            reset_opacity_interval=args.steps // 3,
            eval_interval=10 ** 9, ckpt_interval=10 ** 9, log_interval=100,
            downscale_times=1, double_steps=max(1, args.steps // 8),
            test_stride=args.test_stride)
        t1 = time.time()
        state = fit_scene(scene, out_dir, cfg=cfg, loop=loop)
        src = BatchSource(scene, test_stride=args.test_stride)
        res = do_evaluation(state.params, state.aux, cfg.scene, src,
                            out_dir, step=args.steps)
        res["wall_s"] = round(time.time() - t1, 1)
        print(f"[{tag}] test {res['test'].get('psnr'):.2f} dB, vehicle "
              f"{res['test'].get('vehicle_psnr', float('nan')):.2f} dB, "
              f"human {res['test'].get('human_psnr', float('nan')):.2f} dB",
              flush=True)
        return res

    # Temporal-grid density scaled to the CLIP, not the reference's
    # 150-frame tuning: the c2f virtual resolution must stay at or below
    # ~1 row/frame or held-out frames read grid rows no train frame ever
    # wrote — measured on this gate as "+6 dB train-human absorption,
    # ZERO test-frame transfer" (the heads work; the offsets do not
    # interpolate). The reference's own 30->150 over 150-frame clips is
    # exactly 0.2->1.0 rows/frame; mirror that ratio here.
    min_emb = max(3, int(round(0.2 * args.frames)))
    max_emb = max(min_emb + 1, args.frames)
    emb_kw = dict(min_embeddings=min_emb, max_embeddings=max_emb,
                  c2f_temporal_iter=args.steps)
    res_on = run("emd_on", RigidConfig(**emb_kw))
    res_off = run("emd_off", RigidConfig(no_apply_embed_track=True,
                                         **emb_kw))

    def d(key):
        a = res_on["test"].get(key)
        b = res_off["test"].get(key)
        return None if a is None or b is None else round(a - b, 3)

    gate_key = "human_psnr" if smpl_mode else "vehicle_psnr"
    report = {
        "gate": f"emd_ablation_{args.mode}",
        "steps": args.steps,
        "scene": dict(frames=args.frames, n_bg=args.n_bg,
                      n_veh=args.n_veh, wobble=not smpl_mode,
                      n_ped=args.n_ped if smpl_mode else 0,
                      wobble_ped=smpl_mode,
                      width=args.width, height=args.height),
        "emd_on": res_on,
        "emd_off": res_off,
        "delta_test_psnr": d("psnr"),
        "delta_test_vehicle_psnr": d("vehicle_psnr"),
        "delta_test_human_psnr": d("human_psnr"),
        "delta_test_dynamic_psnr": d("dynamic_psnr"),
        "pass": (d(gate_key) or 0) > 0,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
    with open(args.json_out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps({k: report[k] for k in
                      ("delta_test_psnr", "delta_test_vehicle_psnr",
                       "delta_test_human_psnr", "pass", "wall_s")}))


if __name__ == "__main__":
    main()
