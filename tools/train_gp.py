#!/usr/bin/env python
"""Train the GP new-modules (base recipe) — reference train_qwen_gp.py CLI.

Example:
  python tools/train_gp.py --config train_configs/qwen_gp.yaml \\
      --hf-model /path/Qwen2.5-VL-3B-Instruct --data-config data.yaml \\
      --img-dir /data/images --output-dir ckpt/gp
YAML config keys mirror TrainerConfig fields plus GP model knobs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse


def main():
    from glimpseprune_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="trainer yaml (TrainerConfig keys)")
    ap.add_argument("--data-config", required=True, help="dataset yaml")
    ap.add_argument("--img-dir", default="")
    ap.add_argument("--hf-model", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--output-dir", default="checkpoints/gp")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--resume-from", default=None,
                    help="checkpoint dir: reload new modules + opt state and "
                    "continue the step count (reference --resume_from_checkpoint, "
                    "train_qwen_gp.py:1601-1608,1968)")
    ap.add_argument("--mesh", action="store_true", help="shard over all devices")
    args = ap.parse_args()

    import jax

    from glimpseprune_tpu.config import load_yaml_config
    from glimpseprune_tpu.models.qwen2_5_vl.gp_model import Qwen2_5_VL_GP
    from glimpseprune_tpu.training.data import GPDataset
    from glimpseprune_tpu.training.trainer import GPTrainer, TrainerConfig

    from tools.demo import load_hf_model, make_tiny

    tcfg_kwargs = {}
    if args.config:
        tcfg_kwargs = load_yaml_config(args.config) or {}
    tcfg_kwargs["output_dir"] = args.output_dir
    tcfg = TrainerConfig(**tcfg_kwargs)

    if args.tiny or not args.hf_model:
        cfg, params, tok = make_tiny()
        tcfg.seq_multiple, tcfg.patch_multiple = 8, 16
    else:
        cfg, params, tok = load_hf_model(args.hf_model, {})

    def tokenize(t):
        return list(tok(t) if callable(tok) else tok.encode(t))

    dataset = GPDataset(args.data_config, img_dir=args.img_dir, tokenize=tokenize)
    print(f"dataset: {len(dataset)} samples")

    model = Qwen2_5_VL_GP(cfg)
    if args.mesh and len(jax.devices()) > 1:
        from glimpseprune_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh()
        params = shard_params(params, mesh)
        print(f"mesh: {dict(mesh.shape)}")

    trainer = GPTrainer(cfg, model, params, dataset, tokenize, tcfg=tcfg,
                        resume_from=args.resume_from)
    history = trainer.train(max_steps=args.max_steps)
    print(f"final metrics: {history[-1] if history else {}}")
    print(f"checkpoint: {trainer.save()}")


if __name__ == "__main__":
    main()
