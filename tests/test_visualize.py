"""Headless smoke of the demo visualizer."""

import os

import pytest

from dragposer_tpu.cli import visualize


def test_render_gif(tmp_path, example_bvh_path):
    pytest.importorskip("matplotlib")
    out = str(tmp_path / "demo.gif")
    visualize.render(example_bvh_path, example_bvh_path, out,
                     start=2000, frames=24, stride=8, fps=10)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 10_000
