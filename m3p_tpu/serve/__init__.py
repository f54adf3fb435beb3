"""Production inference serving for M3P-TPU.

The reference has no serving story — inference is only reachable through the
evaluation loop (`/root/reference/M3P/src/evaluation/xevaluator.py`).  This
package adds a first-class deployment surface on top of the same model:

  * `engine.InferenceEngine` — checkpoint-loaded, device-resident model with
    shape-bucketed, jit-cached entry points for ITM scoring, text->image
    retrieval against a device-resident gallery, captioning and translation.
  * `batcher.MicroBatcher` — request coalescing: concurrent single requests
    are batched up to (max_batch, max_wait_ms) before hitting the TPU, the
    standard production pattern for keeping the MXU fed at low latency.
  * `server` — a threaded JSON-over-HTTP frontend (stdlib only) exposing
    /v1/score, /v1/retrieve, /v1/caption, /v1/translate, /health.
"""

from m3p_tpu.serve.batcher import MicroBatcher
from m3p_tpu.serve.engine import InferenceEngine

__all__ = ["InferenceEngine", "MicroBatcher"]
