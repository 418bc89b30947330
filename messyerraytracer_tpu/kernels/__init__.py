"""messyerraytracer_tpu.kernels"""
