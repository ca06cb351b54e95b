import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples"))


def test_image_fitting_loss_drops():
    """End-to-end training smoke (reference: examples/image_fitting.py is the
    de-facto e2e test, SURVEY.md §4). Loss must drop by >60%."""
    from image_fitting import fit

    initial, final, img = fit(
        height=48, width=48, num_points=256, iterations=60,
        lr=2e-2, log_every=0,
    )
    assert final < 0.55 * initial, (initial, final)
    assert img.shape == (48, 48, 3)
