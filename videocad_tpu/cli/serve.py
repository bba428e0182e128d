"""Serving CLI: expose a trained model (or a .vcdx artifact) over HTTP.

Two sources, one protocol (infer/server.py):

    # live model + checkpoint — lane-multiplexed continuous batching
    python -m videocad_tpu.cli.serve \
        --model_config model_configs/transformer_experiments.json \
        --model_name cad_past_10_actions_and_states_timestep_embedding \
        --checkpoint_folder <exp> --lanes 8 [--weight_quant int8]

    # self-contained artifact (no checkpoint/model config needed)
    python -m videocad_tpu.cli.serve --artifact serve/flagship.vcdx

The reference has no serving entry point at all — its closest surface is
the offline ``sequential_inference`` eval (autoregressive_transformer.py:222).
Protocol and engines are documented in docs/SERVING.md; the stdlib client
is ``videocad_tpu.infer.server.ServingClient``.
"""

from __future__ import annotations

import argparse


def build_engine(args):
    if args.artifact:
        import json
        import zipfile

        from videocad_tpu.infer.server import (ArtifactEngine,
                                               ArtifactMuxEngine)

        with zipfile.ZipFile(args.artifact) as zf:
            meta = json.loads(zf.read("meta.json"))
        if meta.get("mux_lanes"):   # lanes=N export -> multi-session
            return ArtifactMuxEngine(args.artifact,
                                     session_ttl_s=args.session_ttl)
        return ArtifactEngine(args.artifact)

    import jax

    from videocad_tpu.infer.server import MuxEngine
    from videocad_tpu.models.factory import create_model, init_model
    from videocad_tpu.utils.io import load_json

    model_params = load_json(args.model_config)[args.model_name]
    model = create_model(model_params)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    if args.checkpoint_folder:
        from videocad_tpu.train.checkpoint import CheckpointHandler
        from videocad_tpu.train.state import TrainState, make_optimizer

        handler = CheckpointHandler(args.checkpoint_folder,
                                    args.checkpoint_dir)
        # The restore target's opt_state tree must match the one training
        # saved: gencad configs train with a frozen CAD encoder
        # (multi_transform), everything else with plain adam.
        tx = make_optimizer({"lr": 0.0},
                            freeze_cad=model.config.use_pretrained_cad_model)
        target = TrainState(step=0, params=params,
                            opt_state=tx.init(params))
        restored, _ = handler.restore(args.checkpoint_name, target)
        params = restored.params
    return MuxEngine(model, params, lanes=args.lanes, seq_len=args.seq_len,
                     weight_quant=args.weight_quant,
                     session_ttl_s=args.session_ttl)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve incremental CAD-agent decode over HTTP")
    parser.add_argument("--artifact", default=None,
                        help=".vcdx artifact (serves without model code)")
    parser.add_argument("--model_config",
                        default="model_configs/transformer_experiments.json")
    parser.add_argument("--model_name",
                        default="cad_past_10_actions_and_states_timestep_embedding")
    parser.add_argument("--checkpoint_folder", default=None,
                        help="experiment name under --checkpoint_dir; "
                             "omit to serve fresh init (protocol smoke)")
    parser.add_argument("--checkpoint_name", default="best_model")
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--lanes", type=int, default=4,
                        help="concurrent sessions multiplexed per device "
                             "program (live-model engine)")
    parser.add_argument("--seq_len", type=int, default=187,
                        help="per-session step horizon (the reference's "
                             "186-action episodes + zero-action start)")
    parser.add_argument("--weight_quant", default="none",
                        choices=["none", "int8", "int4"],
                        help="int8 = w8a16 decoder weight streaming "
                             "(+21%% decode actions/s on v5e); int4 = "
                             "w4a16 (coarser rounding, smaller stream)")
    parser.add_argument("--session_ttl", type=float, default=None,
                        help="evict sessions idle this many seconds when "
                             "lanes are requested (abandoned clients "
                             "can't pin lanes); omit to never evict")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8741)
    args = parser.parse_args(argv)

    from videocad_tpu.infer.server import make_server

    engine = build_engine(args)
    server = make_server(engine, args.host, args.port)
    meta = engine.meta()
    print(f"serving {meta['engine']} engine on "
          f"http://{args.host}:{server.server_address[1]} "
          f"(lanes={meta['lanes']}, seq_len={meta['seq_len']}, "
          f"weight_quant={meta.get('weight_quant')})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.stop()
        server.server_close()


if __name__ == "__main__":
    main()
