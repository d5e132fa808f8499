"""String and anyURI literal vectorizers (token sequences).

The reference tokenizes with a pretrained HuggingFace tokenizer pulled from
torch.hub (reference: mrgcn/encodings/xsd/string.py:48-52) and feeds a frozen
DistilBERT. In an offline TPU environment pretrained downloads are
unavailable, so the default tokenizer is a self-contained byte-level
tokenizer (vocab 259 = 256 bytes + PAD/CLS/SEP) feeding a from-scratch
sequence encoder — the v2.0 paper-parity design. When the configured HF
tokenizer *is* locally cached, it is used instead, preserving the v3.0
behaviour.

This module also covers ``xsd.anyURI`` (the reference's anyURI module is
byte-identical to string except for the datatype filter, and ships a broken
import — reference: xsd/anyURI.py:10 — fixed here by construction).

Sequences are truncated to 512 tokens (reference: string.py:12, 73).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from mrgcn_tpu.data.rdf import xsd
from mrgcn_tpu.encodings.common import literal_nodes, plain_string_nodes

logger = logging.getLogger(__name__)

MAX_CHARS = 512


class ByteTokenizer:
    """Byte-level tokenizer: UTF-8 bytes shifted by nothing, specials above.

    vocab layout: 0..255 bytes, 256 PAD, 257 CLS, 258 SEP.
    """

    VOCAB_SIZE = 259
    PAD, CLS, SEP = 256, 257, 258
    pad_token = "[PAD]"

    @property
    def pad_token_id(self) -> int:
        return self.PAD

    @property
    def vocab_size(self) -> int:
        return self.VOCAB_SIZE

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        if add_special_tokens:
            return [self.CLS] + ids + [self.SEP]
        return ids


def load_tokenizer(feature_config: Dict):
    """Resolve the tokenizer for a string-family feature config.

    Tries the configured HuggingFace tokenizer from the local cache only
    (zero-egress environment); falls back to :class:`ByteTokenizer`.
    """
    tok_cfg = feature_config.get("tokenizer")
    if tok_cfg and "config" in tok_cfg:
        spec = tok_cfg["config"]
        # hub spec format: [repo, kind, model_name, ...] — take the model name
        # (reference: mrgcn/models/utils.py:32-44)
        name = next((s for s in reversed(spec) if "=" not in s), None)
        if name:
            try:
                from mrgcn_tpu.utils.hf import force_hf_offline
                force_hf_offline()
                from transformers import AutoTokenizer
                tokenizer = AutoTokenizer.from_pretrained(
                    name, local_files_only=True)
                if tokenizer.pad_token is None and "pad_token" in tok_cfg:
                    tokenizer.add_special_tokens(
                        {"pad_token": tok_cfg["pad_token"]})
                logger.info("Using HuggingFace tokenizer %s", name)
                return tokenizer
            except Exception:  # offline / not cached
                logger.info("Pretrained tokenizer %s unavailable; "
                            "using byte-level tokenizer", name)
    return ByteTokenizer()


def pad_symbol_for(feature_config: Dict) -> int:
    """The token id used for padding (reference: models/utils.py:61-65)."""
    tokenizer = load_tokenizer(feature_config)
    if isinstance(tokenizer, ByteTokenizer):
        return tokenizer.pad_token_id
    pad_token = feature_config["tokenizer"]["pad_token"]
    return tokenizer.encode(pad_token, add_special_tokens=False)[0]


def generate_features(nodes_map: Dict, node_predicate_map: Dict,
                      config: Dict) -> Optional[List]:
    datatype = config["datatype"]
    if datatype == "xsd.anyURI":
        nodes = literal_nodes(nodes_map, xsd("anyURI"))
    else:
        nodes = plain_string_nodes(nodes_map, xsd("string"))

    tokenizer = load_tokenizer(config)

    sequences: Dict[object, List[np.ndarray]] = {}
    node_idx: Dict[object, List[int]] = {}
    seq_lengths: Dict[object, List[int]] = {}

    failed = 0
    for node, i in nodes:
        try:
            seq = tokenizer.encode(str(node), add_special_tokens=True)
        except Exception:
            failed += 1
            continue
        if len(seq) <= 0:
            failed += 1
            continue

        a = np.asarray(seq, dtype=np.int32)[:MAX_CHARS]
        for p in node_predicate_map.get(node, ()):
            sequences.setdefault(p, []).append(a)
            node_idx.setdefault(p, []).append(i)
            seq_lengths.setdefault(p, []).append(len(a))

    total = sum(len(v) for v in sequences.values())
    logger.debug("Generated %d unique %s features (%d failed)",
                 total, datatype, failed)
    if total <= 0:
        return None

    out = []
    for p in sequences:
        ragged = np.empty(len(sequences[p]), dtype=object)
        for j, a in enumerate(sequences[p]):
            ragged[j] = a
        out.append([ragged,
                    np.asarray(node_idx[p], dtype=np.int32),
                    np.asarray(seq_lengths[p], dtype=np.int32)])
    return out
