#!/usr/bin/env python
"""Training driver — TPU-native replacement for reference train.py.

Flag surface mirrors the reference CLI (train.py:36-90) where meaningful on
TPU; the DP/DDP/NCCL flags collapse into automatic mesh data-parallelism
(--num_devices). Run examples:

    python train.py --dataset synthetic --network efficientdet-d0 \
        --batch_size 8 --num_epoch 2                       # smoke, no data
    python train.py --dataset VOC --dataset_root ~/data/VOCdevkit \
        --network efficientdet-d0 --batch_size 32
    python train.py --resume ./saved/weights/VOC/efficientdet-d0
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

# amortize XLA compiles across runs (single-core host)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def parse_args():
    p = argparse.ArgumentParser(description="EfficientDet-TPU training")
    p.add_argument("--config", default=None,
                   help="YAML experiment config (CLI flags override it)")
    p.add_argument("--dataset", default="VOC",
                   choices=["VOC", "COCO", "synthetic"])
    p.add_argument("--dataset_root", default="/root/data/VOCdevkit/")
    p.add_argument("--network", default="efficientdet-d0")
    p.add_argument("--num_epoch", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=32,
                   help="GLOBAL batch size (sharded over the mesh)")
    p.add_argument("--num_class", type=int, default=None,
                   help="default: dataset's class count")
    p.add_argument("--lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--lr_schedule", default="plateau",
                   choices=["plateau", "none"],
                   help="plateau = ReduceLROnPlateau(0.1, patience 3) on the "
                        "epoch train loss (reference behavior)")
    p.add_argument("--lr_patience", type=int, default=3)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--grad_clip_norm", type=float, default=0.1)
    p.add_argument("--input_size", type=int, default=None)
    p.add_argument("--max_boxes", type=int, default=100)
    p.add_argument("--pretrained_backbone", default=None,
                   help="ImageNet EfficientNet .pth to initialize the "
                        "backbone from (reference models/utils.py:317-328): "
                        "a local blob path, or 'download' to fetch the "
                        "published URL_MAP blob (needs network egress)")
    p.add_argument("--resume", default=None,
                   help="checkpoint dir (or reference .pth) to resume from")
    p.add_argument("--save_folder", default="./saved/weights/")
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--bn_mode", default="frozen",
                   choices=["frozen", "train", "sync"])
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 params)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize MBConv blocks (D5-D7 memory)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel width (default: all devices)")
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard activation HEIGHT over this many devices "
                        "(D5-D7 HBM relief; XLA inserts conv halo "
                        "exchanges). data width x spatial_shards <= devices")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod: jax.distributed.initialize() "
                        "(replaces the reference's mp.spawn/init_process_group)")
    p.add_argument("--native_loader", default="auto",
                   choices=["auto", "on", "off"],
                   help="C++ decode/augment pipeline (efficientdet_tpu."
                        "native); auto = use when buildable")
    p.add_argument("--device_normalize", action="store_true",
                   help="ship raw uint8 pixels to the device and normalize "
                        "inside the jitted step (train_lib."
                        "maybe_normalize_images): 4x less host->device image "
                        "traffic and no host normalize pass — the numerics "
                        "are the exact Normalizer math, fused into the stem "
                        "conv by XLA")
    p.add_argument("--cache_images", action="store_true",
                   help="cache decoded images in host RAM after the first "
                        "epoch (DataLoader cache='ram'): epochs 2+ skip the "
                        "JPEG decode entirely — the big lever on few-core "
                        "hosts where decode, not the TPU, bounds the epoch")
    p.add_argument("--augment", default="basic", choices=["basic", "full"],
                   help="basic = reference train.py's Normalizer/Augmenter/"
                        "Resizer; full = the reference's albumentations "
                        "recipe (bbox-aware crop, flips, transpose, "
                        "photometric, CLAHE)")
    p.add_argument("--platform", default="auto",
                   help="jax platform pin (e.g. 'cpu', 'tpu'); flag, not "
                        "env, because a site hook on some rigs pre-imports "
                        "jax so JAX_PLATFORMS is read too late")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic_length", type=int, default=64)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--log_dir", default=None,
                   help="write metrics.jsonl (and TensorBoard with "
                        "--tensorboard) here")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace for the first steps")
    args, _ = p.parse_known_args()
    if args.config:
        from efficientdet_tpu.utils.yaml_config import experiment_from_yaml
        exp = experiment_from_yaml(args.config)
        p.set_defaults(
            dataset=exp.dataset, dataset_root=exp.dataset_root,
            network=exp.detector.network, num_epoch=exp.num_epoch,
            batch_size=exp.batch_size, num_class=exp.detector.num_classes,
            lr=exp.learning_rate, weight_decay=exp.weight_decay,
            grad_accumulation_steps=exp.grad_accumulation_steps,
            grad_clip_norm=exp.grad_clip_norm,
            input_size=exp.detector.input_size, max_boxes=exp.max_boxes,
            save_folder=exp.save_folder, bn_mode=exp.detector.bn_mode,
            bf16=exp.bf16, remat=exp.remat, seed=exp.seed,
            pretrained_backbone=exp.pretrained_backbone)
    return p.parse_args()


def build_dataset(args, train: bool, input_size: int):
    from efficientdet_tpu.data import (CocoDataset, SyntheticDetection,
                                       VOCDetection, eval_transforms,
                                       get_augmentation, train_transforms)
    dev_norm = getattr(args, "device_normalize", False)
    if train and args.augment == "full":
        # the reference's albumentations recipe (datasets/augmentation.py:8-50)
        tf = get_augmentation("train", width=input_size, height=input_size,
                              seed=args.seed)
    elif train:
        tf = train_transforms(input_size, seed=args.seed,
                              device_normalize=dev_norm)
    else:
        tf = eval_transforms(input_size, device_normalize=dev_norm)
    if args.dataset == "VOC":
        sets = ([("2007", "trainval"), ("2012", "trainval")] if train
                else [("2007", "test")])
        avail = [s for s in sets
                 if os.path.isdir(os.path.join(args.dataset_root, f"VOC{s[0]}"))]
        return VOCDetection(args.dataset_root, image_sets=avail or sets,
                            transform=tf)
    if args.dataset == "COCO":
        return CocoDataset(args.dataset_root,
                           set_name="train2017" if train else "val2017",
                           transform=tf)
    # same transform pipeline as real datasets (eval.py normalizes too)
    return SyntheticDetection(length=args.synthetic_length,
                              image_size=input_size,
                              num_classes=args.num_class or 20,
                              transform=tf,
                              seed=args.seed if train else args.seed + 777)


def main():
    args = parse_args()
    import jax

    from efficientdet_tpu.utils import jax_setup
    jax_setup.enable_compilation_cache()
    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        jax.distributed.initialize()
    import jax.numpy as jnp
    from efficientdet_tpu import EFFICIENTDET, DetectorConfig
    from efficientdet_tpu.data import DataLoader
    from efficientdet_tpu.models import EfficientDet
    from efficientdet_tpu.parallel import (create_mesh, put_batch,
                                           put_replicated, shard_train_step)
    from efficientdet_tpu.train import (OptimizerConfig, PlateauScheduler,
                                        create_train_state, get_learning_rate,
                                        make_loss_step, make_train_step,
                                        set_learning_rate)
    from efficientdet_tpu.utils import checkpoint as ckpt

    input_size = args.input_size or EFFICIENTDET[args.network]["input_size"]
    # resuming a reference .pth: the blob is self-describing — recover
    # num_class/network/epoch from its pickled parser exactly like the
    # reference (train.py:222-226) before any geometry is built
    pth_meta = (ckpt.load_pth_meta(args.resume)
                if args.resume and args.resume.endswith((".pth", ".pt"))
                else None)
    if pth_meta:
        if pth_meta.get("network") in EFFICIENTDET:
            args.network = pth_meta["network"]
            input_size = (args.input_size
                          or EFFICIENTDET[args.network]["input_size"])
        if "num_class" in pth_meta:
            args.num_class = pth_meta["num_class"]
        print(f"recovered from {args.resume}: "
              + ", ".join(f"{k}={v}" for k, v in pth_meta.items()))
    train_ds = build_dataset(args, True, input_size)
    num_classes = args.num_class or train_ds.num_classes()

    cfg = DetectorConfig(num_classes=num_classes, network=args.network,
                         input_size=input_size, bn_mode=args.bn_mode).resolve()
    model = EfficientDet(config=cfg,
                         dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                         remat=args.remat)
    opt_cfg = OptimizerConfig(
        learning_rate=args.lr, weight_decay=args.weight_decay,
        grad_clip_norm=args.grad_clip_norm,
        grad_accumulation_steps=args.grad_accumulation_steps)

    mesh = create_mesh(args.num_devices, num_spatial=args.spatial_shards)
    n_data = mesh.shape["data"]
    assert args.batch_size % n_data == 0, \
        f"global batch {args.batch_size} must divide over {n_data} devices"
    # per-host data sharding: each host loads a DISJOINT 1/num_hosts slice of
    # the same global shuffle and 1/num_hosts of the global batch — the
    # sampler the reference's DDP path forgot (train.py:199-204); put_batch
    # assembles the per-host slices into one global array over the mesh.
    num_hosts, host_id = jax.process_count(), jax.process_index()
    assert args.batch_size % (num_hosts or 1) == 0, \
        f"global batch {args.batch_size} must divide over {num_hosts} hosts"
    host_batch = args.batch_size // num_hosts
    is_chief = host_id == 0
    if is_chief:
        print(f"devices: {n_data} data x {mesh.shape['spatial']} spatial "
              f"| hosts: {num_hosts} | global batch: {args.batch_size} "
              f"| per-host: {host_batch} "
              f"| per-device: {args.batch_size // n_data}")

    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, rng, input_size, opt_cfg)
    if args.pretrained_backbone:
        # ImageNet backbone init (reference models/utils.py:317-328). Unlike
        # the reference — which downloads the blob and then He-reinitializes
        # every conv over it (efficientdet.py:47-53) — the imported weights
        # are KEPT (known deviation #1, docs/DESIGN.md). --resume below
        # still overrides everything it restores.
        from efficientdet_tpu.utils.pretrained import load_pretrained_backbone
        variables = {"params": jax.tree.map(np.asarray, state.params),
                     "batch_stats": jax.tree.map(np.asarray,
                                                 state.batch_stats)}
        variables = load_pretrained_backbone(
            cfg.backbone_name, variables,
            path=(None if args.pretrained_backbone == "download"
                  else args.pretrained_backbone))
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"initialized {cfg.backbone_name} backbone from "
              f"{args.pretrained_backbone}")
    save_dir = os.path.join(args.save_folder, args.dataset, args.network)

    start_epoch = 0
    if args.resume:
        if args.resume.endswith((".pth", ".pt")):
            variables = ckpt.load_weights(
                args.resume, {"params": jax.tree.map(np.asarray, state.params),
                              "batch_stats": jax.tree.map(np.asarray,
                                                          state.batch_stats)})
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
            if pth_meta and "epoch" in pth_meta:
                start_epoch = pth_meta["epoch"] + 1  # ref train.py:226
            print(f"imported torch weights from {args.resume} "
                  f"(start_epoch={start_epoch})")
        else:
            state, start_epoch = ckpt.restore_checkpoint(args.resume, state)
            print(f"resumed from {args.resume} at epoch {start_epoch}")

    state = put_replicated(state, mesh)
    train_step = shard_train_step(make_train_step(model, cfg), mesh)
    # the native C++ pipeline implements the basic transform stack only;
    # the full augmentation recipe runs through the dataset's Python path
    train_native = "off" if args.augment == "full" else args.native_loader
    assert not (args.device_normalize and args.augment == "full"), \
        "--device_normalize requires the basic transform path (the full " \
        "albumentations recipe normalizes internally)"
    loader = DataLoader(train_ds, host_batch, shuffle=True,
                        max_boxes=args.max_boxes, seed=args.seed,
                        shard_index=host_id, num_shards=num_hosts,
                        native=train_native, image_size=input_size,
                        flip_prob=0.5,
                        cache="ram" if args.cache_images else "off",
                        uint8_images=args.device_normalize)
    scheduler = (PlateauScheduler(factor=0.1, patience=args.lr_patience)
                 if args.lr_schedule == "plateau" else None)
    step_rng = jax.random.PRNGKey(args.seed + 1)

    # validation-loss loop (reference test(), train.py:141-152, every 5 epochs)
    val_loss_step = jax.jit(make_loss_step(model, cfg))
    try:
        val_ds = build_dataset(args, False, input_size)
        val_loader = DataLoader(val_ds, host_batch, shuffle=False,
                                max_boxes=args.max_boxes, drop_last=True,
                                shard_index=host_id, num_shards=num_hosts,
                                native=args.native_loader,
                                image_size=input_size,
                                uint8_images=args.device_normalize)
    except (FileNotFoundError, OSError):
        val_loader = None  # no val split on disk

    def validate():
        if val_loader is None or len(val_loader) == 0:
            return None
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # accumulate ON DEVICE, fetch once: a per-batch float() costs a full
        # tunnel RTT and stalls the pipeline (same pattern as the train loop)
        total = None
        steps = 0
        for vbatch in val_loader:
            vbatch = put_batch(vbatch, mesh)
            lc, lr = val_loss_step(variables, vbatch)
            s = lc + lr
            total = s if total is None else total + s
            steps += 1
        return float(jax.device_get(total)) / steps if steps else None

    from efficientdet_tpu.utils.visualization import MetricLogger
    logger = MetricLogger(args.log_dir, tensorboard=args.tensorboard)

    global_step = 0
    for epoch in range(start_epoch, args.num_epoch):
        t0 = time.time()
        # accumulate the epoch loss ON DEVICE: a per-step device_get would
        # stall the pipeline (and on a tunneled TPU costs a full RTT each)
        loss_sum = None
        steps = 0
        for it, batch in enumerate(loader):
            batch = put_batch(batch, mesh)
            if args.profile_dir and global_step == 5:
                jax.profiler.start_trace(args.profile_dir)
            state, metrics = train_step(state, batch, step_rng)
            if args.profile_dir and global_step == 10:
                jax.profiler.stop_trace()
            global_step += 1
            steps += 1
            loss_sum = (metrics["loss"] if loss_sum is None
                        else loss_sum + metrics["loss"])
            if it % args.log_every == 0 and is_chief:
                m = jax.device_get(metrics)
                lr_now = get_learning_rate(state.opt_state)
                print(f"epoch {epoch} it {it}/{len(loader)} "
                      f"loss {float(m['loss']):.4f} "
                      f"(cls {float(m['cls_loss']):.4f} "
                      f"reg {float(m['reg_loss']):.4f}) "
                      f"lr {lr_now:.2e}")
                logger.update(global_step, loss=float(m["loss"]),
                              cls_loss=float(m["cls_loss"]),
                              reg_loss=float(m["reg_loss"]), lr=lr_now)
        epoch_loss = (float(jax.device_get(loss_sum)) / steps if steps
                      else float("nan"))
        dt = time.time() - t0
        ips = len(loader) * args.batch_size / max(dt, 1e-9)
        if is_chief:
            print(f"epoch {epoch} done: loss {epoch_loss:.4f} "
                  f"({dt:.1f}s, {ips:.1f} img/s)")
            logger.update(global_step, epoch=epoch, epoch_loss=epoch_loss,
                          images_per_sec=ips)
        if args.eval_every and (epoch + 1) % args.eval_every == 0:
            val = validate()
            if val is not None and is_chief:
                print(f"epoch {epoch} val loss: {val:.4f}")
                logger.update(global_step, val_loss=val)
        if scheduler is not None:
            new_lr = scheduler.step(epoch_loss,
                                    get_learning_rate(state.opt_state))
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, new_lr))
        if (epoch + 1) % args.save_every == 0 and is_chief:
            # params are replicated; the chief's copy is the global state
            host_state = jax.device_get(state)
            path = ckpt.save_checkpoint(save_dir, host_state, cfg, epoch)
            print(f"saved checkpoint -> {path}")
    logger.close()


if __name__ == "__main__":
    main()
