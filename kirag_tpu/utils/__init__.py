from kirag_tpu.utils.io import (
    load_json,
    save_json,
    load_tsv,
    save_tsv,
    hash_object,
)
from kirag_tpu.utils.seeding import seed_everything
from kirag_tpu.utils.logging import setup_logger

__all__ = [
    "load_json",
    "save_json",
    "load_tsv",
    "save_tsv",
    "hash_object",
    "seed_everything",
    "setup_logger",
]
