"""edgedict_tpu — a TPU-native online speech recognition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
theblackcat102/edgedict (streaming RNN-Transducer ASR): log-mel frontend,
uni-directional LSTM/GRU encoder with time reduction, prediction network,
joint network, RNN-T lattice loss, streaming greedy/beam decoding, wav2vec 2.0
self-supervised pretraining, RNN language model, and AOT-compiled export.

Design (see SURVEY.md §7):
  * one pure-functional model core — params pytree + explicit RNN state pytree;
    the same step functions serve training (scan over full T), batched eval,
    and streaming (scan over chunks with carried state)
  * static shapes everywhere; variable length via masks + length bucketing
  * parallelism is a single pjit data-parallel train step over a device mesh
  * bf16 compute / fp32 params replaces apex AMP
"""

__version__ = "0.5.0"
