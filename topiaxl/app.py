"""Interactive demo app (reference app.py:90-267 parity).

The reference Gradio demo is a THREE-stage pipeline with persistent
session state: (1) background removal + recentering of the input photo,
(2) DiT sampling -> PrimX with a reconstruction preview, (3) GLB export
with quality knobs (MC resolution 128/256, decimation, remesh,
Faster/Better unwrap). ``App`` implements those stages headlessly with
the models built once and cached (the reference reloads per session);
``launch_ui`` wraps the same object in a Gradio Blocks UI with the
reference's knob set when gradio is installed (it is not baked into
this environment). ``python -m topiaxl.app image.png [config]`` runs
all three stages headless.
"""

from __future__ import annotations

import os
import sys


class App:
    """Staged image -> PrimX -> GLB pipeline with cached models.

    Mirrors the reference app flow (app.py:90-142 process/export split):
    stage outputs persist on the instance so export can re-run with
    different knobs without re-sampling.
    """

    def __init__(self, config_path: str = "configs/inference_dit.yml",
                 overrides=(), workdir: str = "runs/app"):
        import jax

        import topiaxl.registry  # noqa: F401
        from topiaxl.core import build, load_config
        from topiaxl.diffusion import create_diffusion
        from topiaxl.models.latent_stats import get_latent_stats

        self.cfg = load_config(config_path, overrides=list(overrides))
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

        self.dit = build(self.cfg.model.generator)
        self.vae = build(self.cfg.model.vae)
        self.conditioner = build(self.cfg.model.conditioner)
        self.latent_nf = float(self.cfg.model.get("latent_nf", 1.0))
        self.latent_mean, self.latent_std = get_latent_stats(
            self.cfg.model.get("latent_stats", "primx_v1"))
        self._create_diffusion = create_diffusion
        self._params = None  # lazy: (dit_params, vae_params)
        self._jax = jax
        self.prepared = None   # stage-1 input image [H, W, 3] float 0..255
        self.primx = None      # stage-2 output PrimXParams

    # -- parameters ---------------------------------------------------------

    def _ensure_params(self):
        if self._params is not None:
            return self._params
        import jax.numpy as jnp

        from topiaxl.cli.infer import load_model_params

        self._params = load_model_params(
            self.cfg, self.dit, self.vae, self.conditioner,
            self._jax.random.PRNGKey(0))
        del jnp
        return self._params

    # -- stage 1: preprocess -------------------------------------------------

    def preprocess(self, image_path: str, remove_bg: bool = True,
                   foreground_ratio: float = 0.85):
        """Matte + recenter (reference app.py background-removal stage).
        Uses U^2-Net when ``inference.u2net_checkpoint`` weights exist
        (the network the reference's rembg stage runs), else GrabCut."""
        from topiaxl.cli.infer import prepare_image
        from topiaxl.ops.matting import load_u2net

        if not hasattr(self, "_matter"):
            self._matter = load_u2net(
                self.cfg.get("inference", {}).get("u2net_checkpoint", ""))
        self.prepared = prepare_image(
            image_path, foreground_ratio,
            matting="auto" if remove_bg else "threshold",
            matter=self._matter)
        return self.prepared

    # -- stage 2: generate ---------------------------------------------------

    def generate(self, steps: int = 25, cfg_scale: float = 6.0,
                 seed: int = 42, sampler: str = "ddim"):
        """Denoise -> PrimX (reference app.py generate stage);
        ``sampler='dpm'`` runs DPM-Solver++(2M) (use ~half the steps)."""
        import jax.numpy as jnp

        from topiaxl.pipelines import infer as P

        if self.prepared is None:
            raise RuntimeError("call preprocess(image) first")
        dit_params, vae_params = self._ensure_params()
        diffusion = self._create_diffusion(
            timestep_respacing=f"ddim{int(steps)}",
            noise_schedule=self.cfg.diffusion.noise_schedule,
            parameterization=self.cfg.diffusion.parameterization,
            diffusion_steps=int(self.cfg.diffusion.diffusion_steps),
        )
        y = self.conditioner.encode_image(
            jnp.asarray(self.prepared)[None])
        self.primx = P.generate_primx(
            self.dit, self.vae, diffusion, dit_params, vae_params, y,
            self._jax.random.PRNGKey(int(seed)),
            self.latent_mean, self.latent_std, self.latent_nf,
            cfg_scale=float(cfg_scale),
            prim_shape=int(self.cfg.model.prim_shape),
            dim_feat=int(self.cfg.model.dim_feat),
            sampler=sampler,
        )
        P.save_primx(os.path.join(self.workdir, "denoised.npz"), self.primx)
        return self.primx

    def preview(self, path: str | None = None):
        """Frontal recon snapshot of the current PrimX (the reference's
        per-step visualization, app.py preview pane)."""
        from topiaxl.render.visualize import visualize_primvolume

        if self.primx is None:
            raise RuntimeError("call generate() first")
        path = path or os.path.join(self.workdir, "preview.jpg")
        visualize_primvolume(path, self.primx)
        return path

    # -- stage 3: export -----------------------------------------------------

    def export(self, mc_resolution: int = 256, decimate: int = 100000,
               texture_size: int = 1024, fast_unwrap: bool = True,
               remesh: bool = False, ssaa: int = 1):
        """PrimX -> pbr_mesh.glb (reference app.py export stage knobs:
        MC res 128/256, remesh, unwrap Faster/Better)."""
        from topiaxl.pipelines import infer as P

        if self.primx is None:
            raise RuntimeError("call generate() first")
        return P.extract_glb(
            self.primx, self.workdir,
            mc_resolution=int(mc_resolution), decimate=int(decimate),
            texture_size=int(texture_size),
            batch_size=int(self.cfg.inference.get("batch_size", 32768)),
            prim_shape=int(self.cfg.model.prim_shape),
            dim_feat=int(self.cfg.model.dim_feat),
            fast_unwrap=bool(fast_unwrap), remesh=bool(remesh),
            ssaa=int(ssaa),
        )

    def run(self, image_path: str, **kw):
        """All three stages; defaults come from the config's inference
        block (the CLI's knobs), overridable per call."""
        inf = self.cfg.inference
        self.preprocess(image_path, remove_bg=kw.pop("remove_bg", True))
        self.generate(
            steps=kw.pop("steps", int(inf.get("ddim", 25)) or 25),
            cfg_scale=kw.pop("cfg_scale", float(inf.get("cfg", 6.0))),
            seed=kw.pop("seed", int(inf.get("seed", 42))))
        kw.setdefault("mc_resolution", int(inf.get("mc_resolution", 256)))
        kw.setdefault("decimate", int(inf.get("decimate", 100000)))
        kw.setdefault("fast_unwrap", bool(inf.get("fast_unwrap", True)))
        kw.setdefault("remesh", bool(inf.get("remesh", False)))
        return self.export(**kw)


def launch_ui(config_path: str = "configs/inference_dit.yml",
              overrides=()):
    """Gradio Blocks UI with the reference's knob set (app.py:144-267)."""
    try:
        import gradio as gr
    except ImportError:
        print("gradio is not installed; falling back to headless mode.\n"
              "usage: python -m topiaxl.app <image> [config.yml]")
        return None

    app = App(config_path, overrides)

    # HDR-relightable GLB viewer (reference app.py:218-249): LitModel3D
    # renders the PBR material under an uploadable .hdr environment —
    # the reference's way of eyeballing roughness/metallic. The widget
    # ships as a separate gradio component package; plain gr.Model3D is
    # the fallback when it isn't installed.
    try:
        from gradio_litmodel3d import LitModel3D as _Viewer3D

        _has_lit = True
    except ImportError:
        _Viewer3D = gr.Model3D
        _has_lit = False

    with gr.Blocks(title="topiaxl — 3DTopia-XL on TPU") as demo:
        gr.Markdown("# topiaxl — single image to PBR 3D asset (TPU-native)")
        with gr.Row():
            with gr.Column():
                inp = gr.Image(label="input image", type="filepath")
                remove_bg = gr.Checkbox(True, label="remove background")
                prep_view = gr.Image(label="preprocessed", interactive=False)
                prep_btn = gr.Button("1 — Preprocess")
            with gr.Column():
                steps = gr.Radio([25, 50, 100, 200], value=25,
                                 label="DDIM steps")
                cfg = gr.Slider(0, 10, value=6, step=0.5, label="CFG scale")
                seed = gr.Number(value=42, precision=0, label="seed")
                gen_btn = gr.Button("2 — Generate")
                preview = gr.Image(label="reconstruction preview",
                                   interactive=False)
            with gr.Column():
                mc = gr.Radio([128, 256], value=256, label="MC resolution")
                deci = gr.Number(value=100000, precision=0,
                                 label="max faces")
                unwrap = gr.Radio(["Faster", "Better"], value="Faster",
                                  label="UV unwrap")
                remesh = gr.Checkbox(False, label="isotropic remesh")
                exp_btn = gr.Button("3 — Export GLB")
                if _has_lit:
                    viewer = _Viewer3D(label="generated GLB",
                                       clear_color=[0.0, 0.0, 0.0, 0.0],
                                       tonemapping="aces", contrast=1.0,
                                       scale=1.0)
                    hdr_file = gr.File(label="HDR envmap (relight)",
                                       file_types=[".hdr"],
                                       file_count="single")
                    hdr_file.change(
                        lambda x: gr.update(
                            env_map=x.name if x is not None else None),
                        inputs=hdr_file, outputs=[viewer])
                else:
                    viewer = _Viewer3D(label="generated GLB")

        def _prep(image, rm):
            img = app.preprocess(image, remove_bg=bool(rm))
            return img.astype("uint8")

        def _gen(s, c, sd):
            app.generate(int(s), float(c), int(sd))
            return app.preview()

        def _exp(m, d, uw, rm):
            return app.export(mc_resolution=int(m), decimate=int(d),
                              fast_unwrap=(uw == "Faster"),
                              remesh=bool(rm))

        prep_btn.click(_prep, [inp, remove_bg], prep_view)
        gen_btn.click(_gen, [steps, cfg, seed], preview)
        exp_btn.click(_exp, [mc, deci, unwrap, remesh], viewer)
    demo.launch()
    return demo


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv:
        app = App(argv[1] if len(argv) > 1 else "configs/inference_dit.yml",
                  overrides=argv[2:])
        glb = app.run(argv[0])
        print(glb)
        return 0
    launch_ui()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
