"""CLI entry — TPU-native rebuild of klae01/ddim-audio.

Same surface as the reference ``main.py:19-223``: flags, run-dir layout
(exp/logs/<doc>, exp/tensorboard/<doc>, exp/image_samples/<folder>),
interactive overwrite prompts (suppressed by --ni), resolved-config dump,
logging handlers, seeding — but dispatching to the JAX runner. One deliberate
change: a failed run exits non-zero (the reference swallows exceptions into
exit code 0, reference main.py:212-223 — SURVEY.md §5 failure detection).
"""

import argparse
import logging
import os
import shutil
import sys
import traceback

import numpy as np
import yaml


def parse_args_and_config(argv=None):
    parser = argparse.ArgumentParser(description=globals()["__doc__"])
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the config file")
    parser.add_argument("--seed", type=int, default=1234, help="Random seed")
    parser.add_argument("--exp", type=str, default="exp",
                        help="Path for saving running related data.")
    parser.add_argument("--doc", type=str, required=True,
                        help="A string for documentation purpose. "
                        "Will be the name of the log folder.")
    parser.add_argument("--comment", type=str, default="",
                        help="A string for experiment comment")
    parser.add_argument("--verbose", type=str, default="info",
                        help="Verbose level: info | debug | warning | critical")
    parser.add_argument("--test", action="store_true",
                        help="Whether to test the model")
    parser.add_argument("--sample", action="store_true",
                        help="Whether to produce samples from the model")
    parser.add_argument("--fid", action="store_true")
    parser.add_argument("--interpolation", action="store_true")
    parser.add_argument("--resume_training", action="store_true",
                        help="Whether to resume training")
    parser.add_argument("-i", "--image_folder", type=str, default="images",
                        help="The folder name of samples")
    parser.add_argument("--ni", action="store_true",
                        help="No interaction. Suitable for Slurm Job launcher")
    parser.add_argument("--use_pretrained", action="store_true")
    parser.add_argument("--sample_type", type=str, default="generalized",
                        help="sampling approach (generalized or ddpm_noisy)")
    parser.add_argument("--skip_type", type=str, default="uniform",
                        help="skip according to (uniform or quadratic)")
    parser.add_argument("--timesteps", type=int, default=1000,
                        help="number of steps involved")
    parser.add_argument("--eta", type=float, default=0.0,
                        help="eta used to control the variances of sigma")
    parser.add_argument("--sequence", type=int, default=None,
                        help="while sample the sequence, number of "
                        "intermediates in each case")
    args = parser.parse_args(argv)
    args.log_path = os.path.join(args.exp, "logs", args.doc)

    from ddim_audio_tpu.config import load_config, dump_config

    cfg_path = args.config
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join("configs", args.config)
    new_config = load_config(cfg_path)

    tb_path = os.path.join(args.exp, "tensorboard", args.doc)

    if not args.test and not args.sample:
        if not args.resume_training:
            if os.path.exists(args.log_path):
                overwrite = args.ni or _ask(f"Folder already exists. Overwrite? (Y/N)")
                if overwrite:
                    shutil.rmtree(args.log_path)
                    if os.path.exists(tb_path):
                        shutil.rmtree(tb_path)
                    os.makedirs(args.log_path)
                else:
                    print("Folder exists. Program halted.")
                    sys.exit(0)
            else:
                os.makedirs(args.log_path)
            dump_config(new_config, os.path.join(args.log_path, "config.yml"))

        try:
            import torch.utils.tensorboard as tb

            new_config.tb_logger = tb.SummaryWriter(log_dir=tb_path)
        except Exception:  # tensorboard optional; metrics still hit the log
            new_config.tb_logger = None
        _setup_logging(args, file_log=True)
    else:
        _setup_logging(args, file_log=False)
        if args.sample:
            os.makedirs(os.path.join(args.exp, "image_samples"), exist_ok=True)
            args.image_folder = os.path.join(
                args.exp, "image_samples", args.image_folder
            )
            if not os.path.exists(args.image_folder):
                os.makedirs(args.image_folder)
            elif not (args.fid or args.interpolation):
                overwrite = args.ni or _ask(
                    f"Image folder {args.image_folder} already exists. "
                    "Overwrite? (Y/N)"
                )
                if overwrite:
                    shutil.rmtree(args.image_folder)
                    os.makedirs(args.image_folder)
                else:
                    print("Output image folder exists. Program halted.")
                    sys.exit(0)

    import jax

    from ddim_audio_tpu.utils.compile_cache import enable_persistent_cache

    # remote-TPU compiles are minutes-expensive; cache them across runs
    enable_persistent_cache()

    logging.info("Using devices: {}".format(jax.devices()))
    new_config.device = str(jax.devices()[0])

    np.random.seed(args.seed)

    mp = getattr(new_config.model, "matmul_precision", None)
    if mp:
        jax.config.update("jax_default_matmul_precision", mp)

    return args, new_config


def _ask(prompt):
    return input(prompt).upper() == "Y"


def _setup_logging(args, *, file_log):
    level = getattr(logging, args.verbose.upper(), None)
    if not isinstance(level, int):
        raise ValueError("level {} not supported".format(args.verbose))
    formatter = logging.Formatter(
        "%(levelname)s - %(filename)s - %(asctime)s - %(message)s"
    )
    logger = logging.getLogger()
    handler1 = logging.StreamHandler()
    handler1.setFormatter(formatter)
    logger.addHandler(handler1)
    if file_log:
        handler2 = logging.FileHandler(os.path.join(args.log_path, "stdout.txt"))
        handler2.setFormatter(formatter)
        logger.addHandler(handler2)
    logger.setLevel(level)


def main(argv=None):
    args, config = parse_args_and_config(argv)
    logging.info("Writing log file to {}".format(args.log_path))
    logging.info("Exp instance id = {}".format(os.getpid()))
    logging.info("Exp comment = {}".format(args.comment))

    from ddim_audio_tpu.runners import Diffusion

    try:
        runner = Diffusion(args, config)
        if args.sample:
            runner.sample()
        elif args.test:
            runner.test()
        else:
            runner.train()
    except Exception:
        logging.error(traceback.format_exc())
        return 1  # the reference returns 0 here — swallowing failures

    return 0


if __name__ == "__main__":
    sys.exit(main())
