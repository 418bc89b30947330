"""messyerraytracer_tpu.core"""
