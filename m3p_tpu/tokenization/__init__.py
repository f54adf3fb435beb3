from m3p_tpu.tokenization.tokenizer import XLMRTokenizer, batch_sentences
from m3p_tpu.tokenization.unigram import UnigramModel, train_unigram
