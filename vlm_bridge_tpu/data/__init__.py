"""GroundCap data pipeline: download/transform/split tooling, the
captions.jsonl dataset + fixed-shape batch loader, tokenizers, and
device-side image preprocessing."""
