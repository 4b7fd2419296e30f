"""visper_lm_tpu: a TPU-native (JAX/XLA/Pallas/pjit) multimodal LLM framework with the
capabilities of SHI-Labs/VisPer-LM (OLA-VLM): LLaVA-style vision-language modeling plus
visual-embedding distillation, probing, training, and evaluation."""

__version__ = "0.1.0"
