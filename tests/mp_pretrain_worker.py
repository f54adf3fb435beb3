"""Worker for the 4-process pretrain multi-host test (test_multiprocess.py).

Launched as:
  python tests/mp_pretrain_worker.py <pid> <nproc> <port> <data_dir> \
      <dump_dir> [--eval_only]

Each process gets 2 virtual CPU devices (4 x 2 = 8 global); the CLI runs the
PRETRAIN family — shard-scheduled `google-img` rel task (train_order.json)
plus the xMLM stream — with per-process Grain feeder shards assembled into
global batches and COLLECTIVE Orbax checkpointing.  The parent test SIGTERMs
the group mid-epoch (preemption save) and relaunches it (mid-epoch resume).
"""

import os
import sys

# The __main__ guard is LOAD-BEARING: Grain data workers (num_workers > 0)
# are spawned multiprocessing children that re-import __main__ — without the
# guard they would re-run the whole CLI with the spawn bootstrap argv.
if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mp_env

    pid, nproc, port, data_dir, dump_dir = sys.argv[1:6]
    eval_only = "--eval_only" in sys.argv[6:]
    mp_env.setup(pid, nproc, port, ndev=2)

    sys.argv = [
        "train_x.py",
        "--is_pretrain", "True",
        "--data_path", data_dir, "--vocab_path", f"{data_dir}/vocab.tsv",
        "--lgs", "en", "--mlm_steps", "en",
        "--cross_rel_steps", "google-img",
        "--google_path", f"{data_dir}/google",
        "--train_order_path", f"{data_dir}/order",
        "--max_region_num", "4", "--sample_n", "2", "--batch_size", "8",
        "--max_len", "12", "--bptt", "12", "--emb_dim", "32",
        "--n_layers", "1", "--n_dec_layers", "1", "--n_heads", "2",
        "--refine_layers", "1", "--dropout", "0.0",
        "--attention_dropout", "0.0", "--fp16", "False",
        "--epoch_size", "480", "--max_epoch", "1",
        "--dump_path", dump_dir, "--exp_name", "mh4", "--exp_id", "1",
    ] + (["--eval_only", "True"] if eval_only else [])

    from m3p_tpu.cli.train_x import main

    main()
