"""m3p_tpu — a TPU-native multitask, multilingual, multimodal pre-training framework.

Built from scratch in JAX/Flax/Pallas with mesh-sharded parallelism, providing the
full capability surface of microsoft/M3P (reference layer map in SURVEY.md §1):
an XLM-R-style multilingual text encoder fused with Faster-RCNN region features,
pre-trained with xMLM / MC-MLM / MC-MRM / MRFR / ITM objectives under Multimodal
Code-switched Training (MCT), fine-tuned and evaluated on multilingual image-text
retrieval, captioning, multimodal MT, news-title generation and slide matching.

Layering (bottom-up):
  m3p_tpu.ops          — Pallas TPU kernels + XLA reference implementations
  m3p_tpu.model        — Flax encoder/decoder, heads, generation
  m3p_tpu.parallel     — device mesh, sharding rules, collectives
  m3p_tpu.tokenization — native (C++) unigram/BPE tokenizer + vocab conventions
  m3p_tpu.data         — masking/MCT transforms, datasets, input pipeline
  m3p_tpu.train        — optimizers, train state, per-objective steps, trainer
  m3p_tpu.eval         — retrieval/caption/generation evaluation, text metrics
  m3p_tpu.utils        — config DSLs, schedules, sampling, logging, metrics
"""

__version__ = "0.1.0"
