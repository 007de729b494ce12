"""Runtime services: metric logging (TensorBoard event files), checkpoint
store, profiling helpers."""
