from kirag_tpu.models.bert import BertConfig, bert_encode, init_bert_params
from kirag_tpu.models.encoders import (
    ENCODER_POOLING,
    Encoder,
    load_encoder,
)

__all__ = [
    "BertConfig",
    "bert_encode",
    "init_bert_params",
    "ENCODER_POOLING",
    "Encoder",
    "load_encoder",
]
