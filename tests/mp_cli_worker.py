"""Worker for the 2-process FULL-CLI multi-host test (test_multiprocess.py).

Launched as:
  python tests/mp_cli_worker.py <pid> <nproc> <port> <data_dir> <dump_dir> [--eval_only]

Each process gets 4 virtual CPU devices; the CLI builds one global
8-device mesh spanning both, per-process Grain shards assemble into
global batches (`stage_array` / make_array_from_process_local_data),
and the Orbax checkpoint save/restore is collective.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mp_env  # noqa: E402

pid, nproc, port, data_dir, dump_dir = sys.argv[1:6]
eval_only = "--eval_only" in sys.argv[6:]
mp_env.setup(pid, nproc, port)

sys.argv = [
    "train_x.py",
    "--data_path", data_dir, "--vocab_path", f"{data_dir}/vocab.tsv",
    "--lgs", "en", "--mlm_steps", "en",
    "--cross_rel_steps", "coco-img", "--coco_path", f"{data_dir}/coco",
    "--max_region_num", "6", "--sample_n", "2", "--batch_size", "8",
    "--max_len", "12", "--bptt", "12", "--emb_dim", "32",
    "--n_layers", "1", "--n_dec_layers", "1", "--n_heads", "2",
    "--refine_layers", "1", "--dropout", "0.0",
    "--attention_dropout", "0.0", "--fp16", "False",
    "--epoch_size", "8", "--max_epoch", "1",
    "--dump_path", dump_dir, "--exp_name", "mh", "--exp_id", "1",
] + (["--eval_only", "True"] if eval_only else [])

from m3p_tpu.cli.train_x import main  # noqa: E402

main()
