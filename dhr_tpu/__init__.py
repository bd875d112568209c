"""dhr_tpu — a TPU-native dense-hybrid-retrieval framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of castorini/dhr
(reference layout surveyed in SURVEY.md): training DistilBERT-family dual
encoders (Dense, Aggretriever, DeLADE/DHR, ColBERT distillation), densifying
high-dimensional lexical vectors into compact (value, argmax-index) pairs, and
serving exact/approximate Gated Inner Product (GIP) retrieval over an index
sharded across a TPU device mesh.

Subpackages
-----------
- ``ops``: jitted/Pallas core ops (densify, aggregate, GIP scoring, top-k,
  quantization).
- ``models``: Flax encoder family with pluggable retrieval heads.
- ``train``: pjit/shard_map training runtime (losses, grad-cache, optimizer,
  checkpointing).
- ``data``: datasets, collation, sampling.
- ``retrieval``: sharded index + search engine, TREC I/O.
- ``eval``: ranking metrics and evaluation harnesses.
- ``parallel``: device-mesh and collective helpers.
- ``densify_offline``: BM25/impact-model sparse vectorizers + streaming
  densification (the Lucene-free front end).
"""

__version__ = "0.4.0"
