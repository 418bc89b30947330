"""messyerraytracer_tpu.scene"""
