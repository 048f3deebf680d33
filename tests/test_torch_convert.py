"""Torch-ResNet checkpoint converter parity tests.

torchvision isn't installed in this environment, so the reference model is
an independent torch implementation of the published ResNet architecture
below, built with torchvision's module/attribute layout so its
``state_dict()`` has the exact key structure real checkpoints carry
(conv1, bn1, layer{i}.{j}.conv{k}/bn{k}/downsample, fc)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn

from runia_core_tpu.models import convert_torch_resnet


class BasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        out = self.bn2(self.conv2(torch.relu(self.bn1(self.conv1(x)))))
        res = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + res)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=10, width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [width, 2 * width, 4 * width, 8 * width]
        layers = []
        cin = width
        for i, c in enumerate(chans):
            stride = 1 if i == 0 else 2
            layers.append(
                tnn.Sequential(BasicBlock(cin, c, stride), BasicBlock(c, c))
            )
            cin = c
        self.layer1, self.layer2, self.layer3, self.layer4 = layers
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = TorchResNet18(num_classes=10, width=16).eval()
    # non-trivial BN running stats (fresh init has mean 0 / var 1)
    with torch.no_grad():
        net.train()
        for _ in range(3):
            net(torch.randn(4, 3, 64, 64))
        net.eval()
    return net


class TestConvertTorchResnet:
    def test_state_dict_keys_are_torchvision_layout(self, torch_net):
        keys = set(torch_net.state_dict().keys())
        assert "conv1.weight" in keys
        assert "layer1.0.conv1.weight" in keys
        assert "layer2.0.downsample.0.weight" in keys
        assert "fc.bias" in keys

    def test_logits_match_torch_eval(self, torch_net):
        model, variables = convert_torch_resnet(
            torch_net.state_dict(), arch="resnet18"
        )
        rng = np.random.RandomState(0)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = torch_net(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        got, taps = model.apply(variables, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
        assert "pre_pool" in taps and "penultimate" in taps

    def test_s2d_stem_on_converted_checkpoint_matches_torch(self, torch_net):
        """Converted torchvision weights -> stem_to_s2d must still match the
        torch forward: the s2d path is a drop-in serving layout for real
        checkpoints, not just fresh inits."""
        import dataclasses

        from runia_core_tpu.models import stem_to_s2d

        model, variables = convert_torch_resnet(
            torch_net.state_dict(), arch="resnet18"
        )
        s2d_model = dataclasses.replace(model, s2d_stem=True)
        rng = np.random.RandomState(1)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            want = torch_net(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
        got, _ = s2d_model.apply(stem_to_s2d(variables), jnp.asarray(x),
                                 train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)

    def test_num_classes_inferred(self, torch_net):
        model, _ = convert_torch_resnet(torch_net.state_dict())
        assert model.num_classes == 10
        assert model.torch_padding

    def test_module_prefix_stripped(self, torch_net):
        sd = {f"module.{k}": v for k, v in torch_net.state_dict().items()}
        model, variables = convert_torch_resnet(sd, arch="resnet18")
        x = jnp.zeros((1, 64, 64, 3))
        logits, _ = model.apply(variables, x, train=False)
        assert logits.shape == (1, 10)

    def test_unknown_arch_raises(self, torch_net):
        with pytest.raises(ValueError):
            convert_torch_resnet(torch_net.state_dict(), arch="resnet99")

    def test_larex_pipeline_on_converted_weights(self, torch_net):
        """Converted weights drive the flagship extraction path end to end."""
        from runia_core_tpu.extraction import FastMCDSamplesExtractor
        from runia_core_tpu.models import build_tapped_forward

        model, variables = convert_torch_resnet(torch_net.state_dict())
        fwd = build_tapped_forward(model, variables, taps=("pre_pool",))
        ex = FastMCDSamplesExtractor(
            model=fwd, layer_type="Conv", reduction_method="fullmean",
            mcd_nro_samples=4, dropblock_probs=0.3, dropblock_sizes=3,
        )
        imgs = np.random.RandomState(1).rand(4, 64, 64, 3).astype(np.float32)
        out = ex.get_ls_samples([(imgs, np.zeros(4))])
        assert out["latent_space_means"].shape == (16, 128)
        assert np.isfinite(out["latent_space_means"]).all()


class TestConvertHFViT:
    """convert_hf_vit parity vs an eval-mode transformers ViT."""

    @pytest.fixture(scope="class")
    def hf_vit(self):
        transformers = pytest.importorskip("transformers")
        cfg = transformers.ViTConfig(
            image_size=32, patch_size=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128, num_labels=5,
        )
        torch.manual_seed(0)
        return transformers.ViTForImageClassification(cfg).eval()

    def test_logits_match_hf_eval(self, hf_vit):
        from runia_core_tpu.models import convert_hf_vit

        model, variables = convert_hf_vit(hf_vit)
        x = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            ref = hf_vit(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
        ours, taps = model.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)
        # CLS token excluded: the tap is the full patch grid.
        assert taps["encoder_tokens"].shape == (3, 4, 4, 32)
        assert taps["pre_head"].shape == (3, 32)

    def test_larex_pipeline_on_converted_vit(self, hf_vit):
        """The converted checkpoint drives the fused LaREx scorer on the
        encoder_tokens tap — the end a reference user actually wants."""
        from runia_core_tpu.detectors import MDLatentSpace
        from runia_core_tpu.inference import build_larex_scorer
        from runia_core_tpu.models import build_tapped_forward, convert_hf_vit

        model, variables = convert_hf_vit(hf_vit)
        forward = build_tapped_forward(model, variables, taps=("encoder_tokens",))
        md = MDLatentSpace()
        md.setup(np.random.RandomState(1).randn(64, 32).astype(np.float32))
        scorer = build_larex_scorer(
            forward, pca_state=None, detector_state=md.state,
            mcd_samples_nro=4, drop_block_prob=0.4, drop_block_size=2,
            tap="encoder_tokens", channel_axis=3,
        )
        logits, scores = scorer(
            jnp.asarray(np.random.RandomState(2).rand(4, 32, 32, 3), jnp.float32),
            jax.random.key(0),
        )
        assert logits.shape == (4, 5)
        assert np.isfinite(np.asarray(scores)).all()


class TestConvertHFGPT2:
    @pytest.fixture(scope="class")
    def hf_gpt2(self):
        transformers = pytest.importorskip("transformers")
        cfg = transformers.GPT2Config(
            vocab_size=128, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        )
        torch.manual_seed(0)
        return transformers.GPT2LMHeadModel(cfg).eval()

    def test_logits_match_hf_eval(self, hf_gpt2):
        from runia_core_tpu.models import convert_hf_gpt2

        model, variables = convert_hf_gpt2(hf_gpt2)
        ids = np.random.RandomState(0).randint(0, 128, (2, 10))
        with torch.no_grad():
            ref = hf_gpt2(torch.from_numpy(ids)).logits.numpy()
        ours, attns, hiddens, _ = model.apply(
            variables, jnp.asarray(ids, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref, rtol=2e-4, atol=2e-5
        )
        assert attns.shape == (2, 2, 4, 10, 10)
        assert hiddens.shape == (3, 2, 10, 32)

    def test_greedy_decode_matches_hf_generate(self, hf_gpt2):
        """The converted checkpoint's KV-cache decode reproduces HF
        generate's greedy trace — the cross-backend contract the LLM
        uncertainty flow relies on."""
        transformers = pytest.importorskip("transformers")
        from runia_core_tpu.llm.generate import JaxGenerator
        from runia_core_tpu.models import convert_hf_gpt2

        model, variables = convert_hf_gpt2(hf_gpt2)
        prompt = [3, 17, 42, 9]
        gen = JaxGenerator(model, variables, max_new_tokens=8, eos_id=None)
        ours = gen.generate(prompt, do_sample=False, output_attentions=False,
                            output_hidden_states=False)
        with torch.no_grad():
            ref = hf_gpt2.generate(
                torch.tensor([prompt]),
                generation_config=transformers.GenerationConfig(
                    max_new_tokens=8, do_sample=False, pad_token_id=0,
                    eos_token_id=None,
                ),
            ).numpy()
        np.testing.assert_array_equal(np.asarray(ours["sequences"]), ref)
