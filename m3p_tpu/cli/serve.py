"""Model server CLI: load a checkpoint and serve inference over HTTP.

The deployment-side counterpart of `cli/train_x.py` (the reference stops at
training/eval; serving is framework-native here).  Examples::

    # serve a fine-tuned retrieval model with an image gallery
    python -m m3p_tpu.cli.serve --reload_model dump/ckpt/params \\
        --vocab_path vocab.spm --features_path test.h5 --load_gallery 1000 \\
        --lgs en-de --port 8470

    # score / retrieve / caption over HTTP
    curl -s localhost:8470/health
    curl -s -X POST localhost:8470/v1/retrieve \\
        -d '{"text": "a dog on a beach", "top_k": 5}'
"""

from __future__ import annotations

import argparse
import logging


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("m3p_tpu model server")
    # model/checkpoint
    p.add_argument("--reload_model", type=str, required=True,
                   help="Orbax checkpoint dir (or params subdir) or a "
                        "reference .pth")
    p.add_argument("--vocab_path", type=str, required=True,
                   help="SentencePiece .spm or in-tree TSV vocab")
    p.add_argument("--emb_dim", type=int, default=768)
    p.add_argument("--n_layers", type=int, default=12)
    p.add_argument("--n_dec_layers", type=int, default=0,
                   help="decoder depth (0 = same as --n_layers)")
    p.add_argument("--n_heads", type=int, default=12)
    p.add_argument("--max_region_num", type=int, default=100)
    p.add_argument("--refine_layers", type=int, default=3)
    p.add_argument("--refine_image", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--lgs", type=str, default="en",
                   help="language list, e.g. en-de-fr (order fixes lang ids, "
                        "reference --lgs)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   help="activation dtype (bfloat16 on TPU; float32 for "
                        "CPU debugging)")
    p.add_argument("--quant", type=str, default="none",
                   help="'int8' = frozen-weight int8 serving: weights "
                        "quantize once at load, GEMMs ride the int8 MXU "
                        "(same checkpoint; small score perturbation)")
    # data / gallery
    p.add_argument("--features_path", type=str, default="",
                   help="h5 region-feature shard for image_id payloads")
    p.add_argument("--load_gallery", type=int, default=0,
                   help="stage the first N store images as the retrieval "
                        "gallery (0 = don't)")
    # decoding defaults
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--max_gen_len", type=int, default=20)
    p.add_argument("--length_penalty", type=float, default=1.0)
    # serving
    p.add_argument("--platform", type=str, default="",
                   help="force a JAX backend (e.g. 'cpu' for smoke-testing "
                        "a serving image off-TPU); default: auto")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8470)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    p.add_argument("--warmup", type=lambda s: s.lower() != "false",
                   default=True, help="pre-compile the scoring path")
    return p


def main(argv=None) -> None:
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.platform:
        # must land before first device use; the env var alone is overridden
        # by platform plugins registered at interpreter start
        import jax

        jax.config.update("jax_platforms", args.platform)

    from m3p_tpu.config import ModelConfig, parse_lgs
    from m3p_tpu.serve.engine import InferenceEngine
    from m3p_tpu.serve.server import serve_forever
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    tokenizer = XLMRTokenizer(args.vocab_path)
    lang2id = parse_lgs(args.lgs)
    cfg = ModelConfig(
        n_words=tokenizer.vocab_size, mask_index=tokenizer.mask_token_id,
        n_layers=args.n_layers,
        n_dec_layers=args.n_dec_layers or args.n_layers,
        emb_dim=args.emb_dim, n_heads=args.n_heads,
        n_langs=max(len(lang2id) + 1, 2), dropout=0.0, attention_dropout=0.0,
        max_region_num=args.max_region_num,
        refine_layers=args.refine_layers, dtype=args.dtype)
    engine = InferenceEngine.from_checkpoint(
        args.reload_model, cfg, tokenizer=tokenizer, quant=args.quant,
        refine_image=args.refine_image, beam_size=args.beam_size,
        max_gen_len=args.max_gen_len, length_penalty=args.length_penalty,
        lang2id=lang2id)
    if args.features_path:
        engine.attach_store(args.features_path)
    if args.load_gallery:
        n = engine.load_gallery_from_store(limit=args.load_gallery)
        logging.getLogger("m3p_tpu").info("gallery: %d images", n)
    if args.warmup:
        engine.warmup()
    serve_forever(engine, args.host, args.port, max_batch=args.max_batch,
                  max_wait_s=args.batch_wait_ms / 1000.0)


if __name__ == "__main__":
    main()
