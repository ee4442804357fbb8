"""Interactive demo app (reference app.py parity).

The reference ships a Gradio UI with stages: background removal ->
generate -> export GLB, with knobs for steps (25/50/100/200), CFG,
seed, MC resolution (128/256), fast/better unwrap (app.py:90-267).
gradio isn't installed in this environment; when it is available the
same staged pipeline is exposed as a UI, otherwise ``python -m
topiaxl.app image.png`` runs the staged pipeline headless with the same
defaults.
"""

from __future__ import annotations

import os
import sys


def build_pipeline(config_path: str = "configs/inference_dit.yml",
                   overrides=()):
    import topiaxl.registry  # noqa: F401
    from topiaxl.cli import infer as cli

    return cli, list(overrides)


def run_headless(image_path: str, config_path: str = "configs/inference_dit.yml",
                 ddim: int = 25, cfg: float = 6.0, seed: int = 42,
                 mc_resolution: int = 256, fast_unwrap: bool = True):
    from topiaxl.cli.infer import main as infer_main

    img_dir = os.path.dirname(os.path.abspath(image_path)) or "."
    overrides = [
        f"inference.input_dir={img_dir}",
        f"inference.ddim={ddim}",
        f"inference.cfg={cfg}",
        f"inference.seed={seed}",
        f"inference.mc_resolution={mc_resolution}",
        f"inference.fast_unwrap={str(fast_unwrap).lower()}",
    ]
    return infer_main([config_path] + overrides)


def launch_ui(config_path: str = "configs/inference_dit.yml"):
    try:
        import gradio as gr  # noqa: F401
    except ImportError:
        print("gradio is not installed; falling back to headless mode.\n"
              "usage: python -m topiaxl.app <image> [config.yml]")
        return None

    import gradio as gr

    with gr.Blocks(title="topiaxl") as demo:
        gr.Markdown("# topiaxl — image to PBR 3D asset (TPU)")
        with gr.Row():
            inp = gr.Image(label="input image", type="filepath")
            out = gr.Model3D(label="generated GLB")
        steps = gr.Radio([25, 50, 100, 200], value=25, label="DDIM steps")
        cfg = gr.Slider(0, 10, value=6, label="CFG scale")
        seed = gr.Number(value=42, label="seed")
        mc = gr.Radio([128, 256], value=256, label="MC resolution")
        btn = gr.Button("Generate")

        def _run(image, steps, cfg, seed, mc):
            run_headless(image, config_path, int(steps), float(cfg),
                         int(seed), int(mc))
            stem = os.path.splitext(os.path.basename(image))[0]
            return os.path.join("runs/inference/topiaxl-sview",
                                "inference_folder", stem, "pbr_mesh.glb")

        btn.click(_run, [inp, steps, cfg, seed, mc], out)
    demo.launch()
    return demo


if __name__ == "__main__":
    if len(sys.argv) > 1:
        raise SystemExit(run_headless(
            sys.argv[1],
            sys.argv[2] if len(sys.argv) > 2 else "configs/inference_dit.yml",
        ))
    launch_ui()
