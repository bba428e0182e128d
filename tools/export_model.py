"""Export a trained model into a self-contained .vcdx serving artifact.

    python tools/export_model.py --model_config model_configs/transformer_experiments.json \
        --model_name cad_past_10_actions_and_states_timestep_embedding \
        --checkpoint checkpoints/<exp>/best_model --batch 8 --bucket 192 \
        --out serve/flagship.vcdx

The artifact bundles config + params + shape-specialized StableHLO for the
teacher-forced forward and the autoregressive rollout (see
videocad_tpu/infer/export.py). ``--checkpoint`` accepts an Orbax checkpoint
directory or a reference torch ``.pt`` (converted on the fly); omit it to
export freshly initialized weights (artifact-format smoke tests).
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_config", required=True,
                    help="model_configs JSON file")
    ap.add_argument("--model_name", required=True,
                    help="named config inside the JSON")
    ap.add_argument("--checkpoint", default=None,
                    help="Orbax checkpoint dir or reference .pt")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=192)
    ap.add_argument("--no_rollout", action="store_true")
    ap.add_argument("--weight_quant", default="none",
                    choices=["none", "int8", "int4"],
                    help="'int8' bakes w8a16 decode into the artifact: the "
                         "rollout quantizes in-program, and decode_step "
                         "streams int8 decoder weights quantized once per "
                         "session via the shipped quantize.shlo (+21%% "
                         "rollout actions/s on v5e, docs/PERF.md)")
    ap.add_argument("--lanes", type=int, default=0,
                    help="also export the lane-multiplexed serving trio "
                         "(mux_init/mux_open/mux_step) specialized to N "
                         "lanes — cli.serve then hosts N concurrent "
                         "sessions from the artifact alone")
    ap.add_argument("--out", required=True, help=".vcdx output path")
    args = ap.parse_args(argv)

    import jax

    from videocad_tpu.infer.export import export_model
    from videocad_tpu.models import create_model, init_model

    with open(args.model_config) as f:
        config = json.load(f)[args.model_name]

    if args.checkpoint and args.checkpoint.endswith((".pt", ".pth")):
        import torch

        from tools.convert_torch_checkpoint import (convert_state_dict,
                                                    detect_config_overrides)
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        config = dict(config, **detect_config_overrides(sd))
        params = jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(x), convert_state_dict(sd, config))
    elif args.checkpoint:
        import os

        from videocad_tpu.train.checkpoint import CheckpointHandler
        from videocad_tpu.train.state import TrainState, make_optimizer
        base, name = os.path.split(args.checkpoint.rstrip("/"))
        handler = CheckpointHandler(os.path.basename(base),
                                    os.path.dirname(base) or ".")
        model = create_model(config)
        init = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
        # Match the opt_state tree training saved (gencad = frozen CAD
        # encoder via multi_transform; see train/trainer.py).
        tx = make_optimizer({"lr": 0.0},
                            freeze_cad=model.config.use_pretrained_cad_model)
        target = TrainState(step=0, params=init, opt_state=tx.init(init))
        restored, _ = handler.restore(name, target)
        params = restored.params
    else:
        model = create_model(config)
        params = init_model(model, jax.random.PRNGKey(0), batch=1,
                            seq_len=2)

    meta = export_model(config, params, args.batch, args.bucket, args.out,
                        with_rollout=not args.no_rollout,
                        weight_quant=args.weight_quant, lanes=args.lanes)
    print(json.dumps({"out": args.out, **meta}))


if __name__ == "__main__":
    main()
