from m3p_tpu.eval.retrieval import retrieval_grid_scores, recall_at_k
from m3p_tpu.eval.bleu import corpus_bleu
from m3p_tpu.eval.cider import cider_score
