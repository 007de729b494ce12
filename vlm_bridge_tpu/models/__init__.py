"""Model families: DINOv2 ViT encoder, Gemma-2 decoder, Bridge-Lite adapter,
and the assembled FullModel. All are pure init/apply functions over pytrees."""
