"""Configuration — one dataclass carrying the reference's CLI knobs.

Mirrors the argparse surface of /root/reference/train.py:24-58 and
predict.py:23-42 (same names and defaults), replacing the comma-string
encodings with real tuples.  `from_args` parses the reference's CLI syntax,
including `lrepochs="10,12,14:2"`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass
class Config:
    # mode / model selection
    mode: str = "train"                      # train | test | profile
    model: str = "red"                       # red | casmvs | ucs
    geo_model: str = "rpc"                   # rpc | pinhole
    dataset_root: str = ""
    loadckpt: Optional[str] = None
    logdir: str = "./checkpoints"
    resume: bool = False

    # input
    view_num: int = 3
    ref_view: int = 2
    batch_size: int = 1
    use_qc: bool = False                     # QC-form RPC warp (ref train.py:28)
    max_h: int = 0                           # crop cap (0 = only round to x32)
    max_w: int = 0

    # cascade
    ndepths: Sequence[int] = (64, 32, 8)
    min_interval: float = 2.5                # = image GSD in meters
    depth_inter_r: Sequence[float] = (4.0, 2.0, 1.0)
    lamb: float = 1.5
    dlossw: Sequence[float] = (0.5, 1.0, 2.0)
    cr_base_chs: Sequence[int] = (8, 8, 8)
    # Pallas sweep tap stencil: 0 = auto (4 when the scene geometry passes
    # sweep_coverage_misses at 4, else 8); explicit 4/8 forces a width.
    sweep_stencil: int = 0
    # Conv compute dtype ("float32" | "bfloat16"); params/geometry stay fp32.
    compute_dtype: str = "float32"
    # HBM storage dtype of the per-view warped sweep volumes in training
    # ("float32" | "bfloat16"): bf16 halves the sweep's volume transport;
    # sampling math, moments, and all gradients stay fp32
    # (models/cascade.py volume_dtype).
    volume_dtype: str = "float32"
    # Reference-checkpoint parity mode: reproduce the reference's
    # grid_sample(align_corners=False) sampling convention + its full-res-
    # then-downsample hypothesis chain (models/cascade.py torch_compat).
    torch_compat: bool = False
    # Fused Pallas RED pipeline: None = auto (on when backend is TPU);
    # True/False forces (models/cascade.py fused_red field).
    fused_red: Optional[bool] = None
    # Fused one-kernel sweep+variance volume (inference path): None = auto
    # (on when backend is TPU); False forces the per-view gather/XLA path
    # (models/cascade.py fused_sweep field — the old SATMVS_FUSED_SWEEP
    # kill-switch as a real config knob).
    fused_sweep: Optional[bool] = None

    # optimization
    epochs: int = 30
    lr: float = 1e-3
    lr_milestones: Sequence[int] = (10, 12, 14)   # epoch ids
    lr_gamma: float = 0.5                          # multiply at each milestone
    wd: float = 0.0
    seed: int = 1

    # logging / checkpointing
    summary_freq: int = 50
    save_freq: int = 1

    # distribution (new vs reference)
    mesh_data: int = 1                       # data-parallel mesh extent
    mesh_spatial: int = 1                    # spatial (H) sharding extent
    mesh_depth: int = 1                      # depth-slab sharding extent (costreg only)

    @property
    def num_stage(self) -> int:
        return len(self.ndepths)

    @classmethod
    def from_args(cls, argv: Optional[Sequence[str]] = None) -> "Config":
        import argparse

        p = argparse.ArgumentParser(description="satmvs_tpu")
        d = cls()
        p.add_argument("--mode", default=d.mode, choices=["train", "test", "profile"])
        p.add_argument("--model", default=d.model, choices=["red", "casmvs", "ucs"])
        p.add_argument("--geo_model", default=d.geo_model, choices=["rpc", "pinhole"])
        p.add_argument("--dataset_root", default=d.dataset_root)
        p.add_argument("--loadckpt", default=None)
        p.add_argument("--logdir", default=d.logdir)
        p.add_argument("--resume", action="store_true")
        p.add_argument("--view_num", type=int, default=d.view_num)
        p.add_argument("--ref_view", type=int, default=d.ref_view)
        p.add_argument("--batch_size", type=int, default=d.batch_size)
        p.add_argument("--use_qc", action="store_true")
        p.add_argument("--max_h", type=int, default=d.max_h)
        p.add_argument("--max_w", type=int, default=d.max_w)
        p.add_argument("--ndepths", default="64,32,8")
        p.add_argument("--min_interval", type=float, default=d.min_interval)
        p.add_argument("--depth_inter_r", default="4,2,1")
        p.add_argument("--lamb", type=float, default=d.lamb)
        p.add_argument("--dlossw", default="0.5,1.0,2.0")
        p.add_argument("--cr_base_chs", default="8,8,8")
        p.add_argument("--sweep_stencil", type=int, default=d.sweep_stencil,
                       choices=[0, 4, 8])
        p.add_argument("--compute_dtype", default=d.compute_dtype,
                       choices=["float32", "bfloat16"])
        p.add_argument("--volume_dtype", default=d.volume_dtype,
                       choices=["float32", "bfloat16"],
                       help="HBM transport dtype of warped sweep volumes "
                            "(bf16 halves sweep traffic; math stays fp32). "
                            "Gather-path only: a no-op under the fused sweep, "
                            "which stores no per-view volumes")
        p.add_argument("--fused_red", default="auto",
                       choices=["auto", "on", "off"],
                       help="fused Pallas RED pipeline (auto = TPU backend)")
        p.add_argument("--fused_sweep", default="auto",
                       choices=["auto", "on", "off"],
                       help="fused one-kernel sweep+variance volume at "
                            "inference (auto = TPU backend); off forces the "
                            "per-view gather path.  Note: --volume_dtype only "
                            "affects the per-view gather path — the fused "
                            "sweep stores no volumes, so it is a no-op there")
        p.add_argument("--epochs", type=int, default=d.epochs)
        p.add_argument("--lr", type=float, default=d.lr)
        p.add_argument("--lrepochs", default="10,12,14:2")
        p.add_argument("--wd", type=float, default=d.wd)
        p.add_argument("--seed", type=int, default=d.seed)
        p.add_argument("--summary_freq", type=int, default=d.summary_freq)
        p.add_argument("--save_freq", type=int, default=d.save_freq)
        p.add_argument("--mesh_data", type=int, default=d.mesh_data)
        p.add_argument("--mesh_spatial", type=int, default=d.mesh_spatial)
        p.add_argument("--mesh_depth", type=int, default=d.mesh_depth)
        a = p.parse_args(argv)

        milestones_str, gamma_str = a.lrepochs.split(":")
        return cls(
            mode=a.mode, model=a.model, geo_model=a.geo_model,
            dataset_root=a.dataset_root, loadckpt=a.loadckpt, logdir=a.logdir,
            resume=a.resume, view_num=a.view_num, ref_view=a.ref_view,
            batch_size=a.batch_size,
            use_qc=a.use_qc, max_h=a.max_h, max_w=a.max_w,
            ndepths=tuple(int(x) for x in a.ndepths.split(",") if x),
            min_interval=a.min_interval,
            depth_inter_r=tuple(float(x) for x in a.depth_inter_r.split(",") if x),
            lamb=a.lamb,
            dlossw=tuple(float(x) for x in a.dlossw.split(",") if x),
            cr_base_chs=tuple(int(x) for x in a.cr_base_chs.split(",") if x),
            sweep_stencil=a.sweep_stencil,
            compute_dtype=a.compute_dtype,
            volume_dtype=a.volume_dtype,
            fused_red={"auto": None, "on": True, "off": False}[a.fused_red],
            fused_sweep={"auto": None, "on": True, "off": False}[a.fused_sweep],
            epochs=a.epochs, lr=a.lr,
            lr_milestones=tuple(int(x) for x in milestones_str.split(",") if x),
            lr_gamma=1.0 / float(gamma_str),
            wd=a.wd, seed=a.seed, summary_freq=a.summary_freq,
            save_freq=a.save_freq, mesh_data=a.mesh_data,
            mesh_spatial=a.mesh_spatial, mesh_depth=a.mesh_depth,
        )
