"""Training stack: jitted train/eval steps, optimizer/schedule factory,
epoch orchestration with early stopping + checkpoint/resume, metric logging."""
