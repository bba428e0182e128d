"""Checkpoint-evaluation CLI — the reference test.py surface, TPU-native.

    python -m videocad_tpu.cli.evaluate \
        --checkpoint_folder <experiment_name> \
        --dataset_path data/data_resized ...

Loads best_model (or a named checkpoint), dumps per-sample prediction CSVs,
runs the first-mistake analysis at tol=10 on val and test, renders the full
plot suite, and reports final teacher-forced metrics on both splits.

Note: the reference unpacks its loaders as (train, test, val) from a
(train, val, test) factory — quirk 4, a val/test swap — which we do NOT
reproduce: splits here mean what they say.
"""

from __future__ import annotations

import argparse
import os


from videocad_tpu.cli.train import build_pipelines
from videocad_tpu.experiment import default_loss_config
from videocad_tpu.cli.plots import run_plot_suite
from videocad_tpu.models.factory import create_model, init_model
from videocad_tpu.train.checkpoint import CheckpointHandler
from videocad_tpu.train.trainer import Trainer
from videocad_tpu.utils.io import load_json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", default="data/data_resized")
    parser.add_argument("--config_path",
                        default="data/data_resized/dataset_split.json")
    parser.add_argument("--image_dir", default=None)
    parser.add_argument("--multiview_dir", default=None)
    parser.add_argument("--model_config",
                        default="model_configs/transformer_experiments.json")
    parser.add_argument("--model_name",
                        default="cad_past_10_actions_and_states_timestep_embedding")
    parser.add_argument("--class_weights", default="class_weights.json")
    parser.add_argument("--checkpoint_folder", required=True)
    parser.add_argument("--checkpoint_name", default="best_model")
    parser.add_argument("--checkpoint_dir", default="checkpoints")
    parser.add_argument("--output_root_dir", default="test")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--buckets", type=int, nargs="*", default=None)
    parser.add_argument("--enable_random", action="store_true", default=False)
    parser.add_argument("--tol", type=int, default=10)
    parser.add_argument("--sequential", action="store_true",
                        help="also run rollout (sequential) evaluation")
    args = parser.parse_args(argv)

    name = args.checkpoint_folder
    plots_dir = os.path.join(args.output_root_dir, name, "plots")
    samples_dir = os.path.join(args.output_root_dir, name, "samples")
    os.makedirs(plots_dir, exist_ok=True)
    os.makedirs(samples_dir, exist_ok=True)

    model_params = load_json(args.model_config)[args.model_name]
    view_ids = ["05", "09", "20"][: model_params.get("num_views", 0)]
    pipes = build_pipelines(args, view_ids, model_params)

    model = create_model(model_params)
    training_config = {
        "lr": 1e-5, "use_mse": True,
        "experiment_name": name,
        "checkpoint_dir": args.checkpoint_dir,
    }
    loss_config = default_loss_config(training_config, args.class_weights)
    trainer = Trainer(model, pipes["train"], pipes["val"], pipes["test"],
                      training_config, loss_config,
                      log_dir=os.path.join(args.output_root_dir, name, "logs"))

    handler = CheckpointHandler(args.checkpoint_folder, args.checkpoint_dir)
    trainer.state, _ = handler.restore(args.checkpoint_name, trainer.state)

    trainer.sample(n=10 ** 9, folder=samples_dir, mode="test")

    for mode in ("val", "test"):
        data = trainer.find_first_mistake(mode=mode, tol=args.tol)
        run_plot_suite(data, plots_dir, name, mode=mode)

    print("\nEvaluating on Validation Set:")
    val_metrics = trainer.evaluate(mode="val")
    print({k: round(v, 2) for k, v in val_metrics.items()
           if k.endswith("accuracy")})
    print("\nEvaluating on Test Set:")
    test_metrics = trainer.evaluate(mode="test")
    print({k: round(v, 2) for k, v in test_metrics.items()
           if k.endswith("accuracy")})
    if args.sequential:
        print("\nSequential (rollout) evaluation on Test Set:")
        seq = trainer.sequential_evaluate(mode="test")
        print({k: round(v, 2) for k, v in seq.items()
               if k.endswith("accuracy")})


if __name__ == "__main__":
    main()
