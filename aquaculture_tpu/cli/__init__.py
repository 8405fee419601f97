"""Command-line entry points, one per pipeline stage.

Mirrors the reference's script surface (reference: README.md Run section):

    python -m aquaculture_tpu.cli.detect     # yolov5 detect.py equivalent
    python -m aquaculture_tpu.cli.geocode    # geocode_results.py equivalent
    python -m aquaculture_tpu.cli.areas      # calc_net_areas.py equivalent
    python -m aquaculture_tpu.cli.cluster    # cluster_facilities equivalent
    python -m aquaculture_tpu.cli.pipeline   # all of the above, fused
    python -m aquaculture_tpu.cli.train      # yolov5 train.py equivalent
"""
