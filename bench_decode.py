"""Secondary benchmark: batched greedy decode throughput (tokens/sec).

Not wired into the driver (bench.py is the headline metric); run manually:
    python bench_decode.py [--batch 8] [--prompt 768] [--new 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--prompt", type=int, default=768)
    p.add_argument("--new", type=int, default=64)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--kv-quant", action="store_true", help="int8 KV cache")
    p.add_argument("--weight-quant", action="store_true", help="w8a16 decoder weights")
    p.add_argument("--weight-quant4", action="store_true",
                   help="w4a16 group-wise int4 decoder weights")
    p.add_argument("--tower", default="clip", choices=["clip", "convnext"],
                   help="convnext = config #3's ConvNeXt-XXL trunk @768px "
                   "(prefill-side cost; decode loop is tower-independent)")
    args = p.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from visper_lm_tpu.config import phi3_clip_vlm, tiny_test_vlm, with_convnext_tower
    from visper_lm_tpu.constants import IMAGE_TOKEN_INDEX
    from visper_lm_tpu.data.collate import build_splice_plan
    from visper_lm_tpu.models.vlm import init_vlm
    from visper_lm_tpu.serve.generate import GenerationConfig, Generator, left_pad_plans

    cfg = tiny_test_vlm(distill=True) if args.smoke else phi3_clip_vlm(distill=True)
    if args.tower == "convnext" and not args.smoke:
        cfg = with_convnext_tower(cfg)
    B = 2 if args.smoke else args.batch
    prompt = 64 if args.smoke else args.prompt
    new = 8 if args.smoke else args.new

    params = init_vlm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    plans = [
        build_splice_plan(
            list(rng.integers(3, cfg.decoder.vocab_size - 10, size=cfg.num_sys_tokens))
            + [IMAGE_TOKEN_INDEX]
            + list(rng.integers(3, cfg.decoder.vocab_size - 10, size=16 + b)),
            None, prompt,
            num_image_tokens=cfg.num_image_tokens,
            num_task_tokens=cfg.distill.num_task_tokens,
            num_tasks=len(cfg.distill.task_order()),
        )
        for b in range(B)
    ]
    batch = left_pad_plans(plans, prompt)
    size = cfg.convnext.image_size if cfg.use_convnext_tower else cfg.vision.image_size
    batch["images"] = rng.normal(size=(B, size, size, 3)).astype(np.float32)

    wq = "int4" if args.weight_quant4 else args.weight_quant
    gen = Generator(
        params, cfg,
        GenerationConfig(max_new_tokens=new, kv_quant=args.kv_quant,
                         weight_quant=wq), B, prompt,
    )
    if wq:
        del params  # the Generator holds a quantized copy; free the bf16 decoder
    out = gen.generate(dict(batch))                      # compile both phases
    n_tok = sum(len(o) for o in out)

    # phase timing: prefill (one multimodal forward + cache fill) vs the decode
    # chunk loop (generate() interleaves host work, so time the jits directly)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    t0 = time.perf_counter()
    logits, cache = gen._prefill(gen.params, jbatch)
    float(jnp.sum(logits))                               # host sync (relay-safe)
    prefill_s = time.perf_counter() - t0

    token = jnp.argmax(logits, axis=-1)
    offsets = jbatch["pad_offsets"]
    key = jax.random.PRNGKey(0)
    chunk = gen.gen_cfg.decode_chunk
    n_chunks = max(new // chunk, 1)
    toks, cache = gen._step(gen.params, cache, token, jnp.int32(0), offsets, key)  # warm
    t0 = time.perf_counter()
    step = chunk
    for _ in range(n_chunks):
        toks, cache = gen._step(gen.params, cache, token, jnp.int32(step), offsets, key)
        step += chunk
    float(jnp.sum(toks))                                 # host sync
    decode_s = time.perf_counter() - t0
    decode_tok_s = B * n_chunks * chunk / decode_s
    del toks, cache, logits                              # free before e2e pass

    t0 = time.perf_counter()
    out = gen.generate(dict(batch))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "greedy_decode_tokens_per_sec",
                "value": round(decode_tok_s, 2),
                "unit": "tokens/s",
                "batch": B,
                "tokens_per_sec_per_seq": round(decode_tok_s / B, 2),
                "decode_step_ms": round(1000 * decode_s / (n_chunks * chunk), 2),
                "prefill_s": round(prefill_s, 3),
                "e2e_tokens_per_sec": round(n_tok / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
