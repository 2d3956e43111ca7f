"""Regenerate the reference-parity golden files under tests/goldens/.

Run ONCE against the mounted reference (requires /root/reference + torch):

    python tools/regen_goldens.py

Goldens are committed as data so the test suite never imports the reference.
They pin: (a) the retention module's three compute modes, (b) end-to-end
eval-mode outputs of random-initialized FS and LS reference models together
with their state dicts (which also exercises the checkpoint converter).
"""

import sys

import numpy as np
import torch


def retention_goldens():
    sys.path.insert(0, "/root/reference/LS-EEND/nnet/modules")
    from retention import MultiScaleRetention, RetNetRelPos

    torch.manual_seed(0)
    D, H, L, T = 32, 4, 5, 20
    rp = RetNetRelPos(embed_dim=D, num_heads=H, recurrent_chunk_size=L)
    ms = MultiScaleRetention(D, H, value_factor=1).eval()
    x = torch.rand(2, T, D)
    with torch.no_grad():
        yp = ms(x, rel_pos=rp(T))
        yc = ms(x, rel_pos=rp(T, chunkwise_recurrent=True), chunkwise_recurrent=True)
    w = {}
    for name in ["q_proj", "k_proj", "v_proj", "g_proj", "out_proj"]:
        m = getattr(ms, name)
        w[name + "_w"] = m.weight.detach().numpy()
        w[name + "_b"] = m.bias.detach().numpy()
    np.savez("tests/goldens/retention_ref.npz", x=x.numpy(),
             y_parallel=yp.numpy(), y_chunkwise=yc.numpy(), D=D, H=H, L=L, **w)
    sys.path.pop(0)


def model_goldens():
    torch.manual_seed(42)
    sys.path.insert(0, "/root/reference/FS-EEND")
    from nnet.model.onl_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm import (
        OnlineTransformerDADiarization as FS)

    # NOTE conv_delay=9: the reference hardcodes padding=9 in its cnn, so
    # only conv_delay=9 is self-consistent (onl_tfm...py:30)
    fs = FS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.1, has_mask=True, max_seqlen=16,
            dec_dim_feedforward=64, conv_delay=9).eval()
    with torch.no_grad():
        fs.enc.bn.running_mean.uniform_(-0.5, 0.5)
        fs.enc.bn.running_var.uniform_(0.5, 1.5)
    x = torch.randn(2, 16, 23)
    with torch.no_grad():
        out, emb, _ = fs.test([x[0], x[1]], [16, 16], max_nspks=4)
    sd = {k: v.numpy() for k, v in fs.state_dict().items()}
    np.savez("tests/goldens/fs_model_ref.npz", x=x.numpy(),
             logits=torch.stack(out).numpy(), emb=torch.stack(emb).numpy(),
             **{"sd__" + k: v for k, v in sd.items()})

    sys.path.insert(0, "/root/reference/LS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    sys.path.remove("/root/reference/FS-EEND")
    from nnet.model.onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask import (
        OnlineConformerRetentionDADiarization as LS)

    ls = LS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.1, max_seqlen=16, recurrent_chunk_size=8,
            feed_forward_expansion_factor=2, dec_dim_feedforward=64,
            conv_kernel_size=5, conv_delay=3).eval()
    with torch.no_grad():
        for blk in ls.enc.encoder.layers:
            bn = blk.sequential[2].module.sequential[5]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    x2 = torch.randn(2, 16, 23)
    with torch.no_grad():
        out2, emb2, _ = ls.test([x2[0], x2[1]], [16, 16], max_nspks=4)
    sd2 = {k: v.numpy() for k, v in ls.state_dict().items()}
    np.savez("tests/goldens/ls_model_ref.npz", x=x2.numpy(),
             logits=torch.stack(out2).numpy(), emb=torch.stack(emb2).numpy(),
             **{"sd__" + k: v for k, v in sd2.items()})


def _ref_standard_loss():
    """Import the reference's actual standard_loss (torchmetrics is absent in
    this image; stub it — loss.py only imports, never uses, PIT from it)."""
    import importlib.util
    import types

    if "torchmetrics" not in sys.modules:
        sys.modules["torchmetrics"] = types.SimpleNamespace(
            PermutationInvariantTraining=None)
    spec = importlib.util.spec_from_file_location(
        "ref_loss", "/root/reference/FS-EEND/train/utils/loss.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.standard_loss


def _label_protocol(labels, lens, n_spks):
    """The Lightning training_step label preprocessing
    (FS-EEND/train/oln_tfm_enc_dec.py:51-77): first-activity sort + silence
    prepended + none appended, truncated per sample to (len, nspk+2).
    labels: list of (T_i, S_i) float tensors. Returns list of tensors."""
    padded = torch.nn.utils.rnn.pad_sequence(
        [torch.nn.functional.pad(l, (0, max(n_spks) - l.shape[1]))
         for l in labels], batch_first=True)
    B, T, S = padded.shape
    first = (torch.arange(1, T + 1)[None, :, None] * padded)
    first = first.masked_fill(first == 0, torch.inf).min(dim=1)[0]
    order = torch.argsort(first, dim=1)
    sorted_l = padded[torch.arange(B)[:, None], :, order].transpose(-1, -2)
    silence = 1.0 - sorted_l.max(-1)[0]
    out = torch.cat([silence.unsqueeze(-1), sorted_l,
                     torch.zeros(B, T, 1)], dim=-1)
    return [out[b, :lens[b], :n_spks[b] + 2] for b in range(len(labels))]


def _make_batch(seed, T_list, n_spk_list, in_size=23):
    """Fixed batch with distinct first-activity frames per speaker column
    (the reference's torch.argsort is not stable; distinct keys make the
    sort unambiguous for both frameworks)."""
    g = torch.Generator().manual_seed(seed)
    feats = [torch.randn(T, in_size, generator=g) for T in T_list]
    labels = []
    for T, S in zip(T_list, n_spk_list):
        l = (torch.rand(T, S, generator=g) > 0.6).float()
        for s in range(S):          # column s first activates at frame 2s
            l[: 2 * s, s] = 0.0
            l[2 * s, s] = 1.0
        labels.append(l)
    return feats, labels


def _run_train_steps(model, feats, labels, lens, n_spks, n_steps=3, lr=1e-3):
    standard_loss = _ref_standard_loss()
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    sd0 = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    steps, grads0 = [], None
    for i in range(n_steps):
        opt.zero_grad()
        tgt = _label_protocol(labels, lens, n_spks)
        preds, emb_loss, _, _ = model(feats, tgt=tgt, ilens=lens)
        pit_loss = standard_loss(preds, tgt, label_delay=0)
        tot = pit_loss + emb_loss
        tot.backward()
        if i == 0:
            grads0 = {k: p.grad.detach().numpy().copy()
                      for k, p in model.named_parameters()
                      if p.grad is not None}
        steps.append([float(pit_loss), float(emb_loss), float(tot)])
        opt.step()
    sdN = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    return sd0, grads0, np.asarray(steps, np.float64), sdN


def train_goldens():
    """Pin the assembled TRAIN chain (label protocol -> train-mode forward
    incl. BN batch stats -> standard_loss + emb loss -> grads -> Adam) for
    FS and LS against the reference Lightning semantics
    (FS-EEND/train/oln_tfm_enc_dec.py:51-92,
    LS-EEND/train/oln_tfm_enc_dec_on_the_fly.py:51-93). dropout=0 removes
    the only RNG dependence."""
    T_list, n_spk_list = [16, 12], [3, 2]

    def pack(path, batch, sd0, grads0, steps, sdN):
        feats, labels = batch
        B, T, S = len(feats), max(T_list), max(n_spk_list)
        feats_pad = np.zeros((B, T, 23), np.float32)
        labels_pad = np.zeros((B, T, S), np.float32)
        for b in range(B):
            feats_pad[b, :T_list[b]] = feats[b].numpy()
            labels_pad[b, :T_list[b], :n_spk_list[b]] = labels[b].numpy()
        np.savez(path, feats=feats_pad, labels=labels_pad,
                 lens=np.asarray(T_list), n_spk=np.asarray(n_spk_list),
                 steps=steps,
                 **{"sd__" + k: v for k, v in sd0.items()},
                 **{"gr__" + k: v for k, v in grads0.items()},
                 **{"sdN__" + k: v for k, v in sdN.items()})

    torch.manual_seed(7)
    sys.path.insert(0, "/root/reference/FS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    from nnet.model.onl_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm import (
        OnlineTransformerDADiarization as FS)

    fs = FS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.0, has_mask=True, max_seqlen=16,
            dec_dim_feedforward=64, conv_delay=9)
    with torch.no_grad():
        fs.enc.bn.running_mean.uniform_(-0.5, 0.5)
        fs.enc.bn.running_var.uniform_(0.5, 1.5)
    batch = _make_batch(1234, T_list, n_spk_list)
    pack("tests/goldens/fs_train_ref.npz", batch,
         *_run_train_steps(fs, batch[0], batch[1], T_list, n_spk_list))
    sys.path.remove("/root/reference/FS-EEND")

    torch.manual_seed(8)
    sys.path.insert(0, "/root/reference/LS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    from nnet.model.onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask import (
        OnlineConformerRetentionDADiarization as LS)

    ls = LS(n_speakers=4, in_size=23, n_units=32, n_heads=4, enc_n_layers=2,
            dec_n_layers=2, dropout=0.0, max_seqlen=16, recurrent_chunk_size=8,
            feed_forward_expansion_factor=2, dec_dim_feedforward=64,
            conv_kernel_size=5, conv_delay=3)
    with torch.no_grad():
        for blk in ls.enc.encoder.layers:
            bn = blk.sequential[2].module.sequential[5]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    batch = _make_batch(5678, T_list, n_spk_list)
    pack("tests/goldens/ls_train_ref.npz", batch,
         *_run_train_steps(ls, batch[0], batch[1], T_list, n_spk_list))
    sys.path.remove("/root/reference/LS-EEND")


def prod_train_goldens():
    """Production-shape TRAIN golden (VERDICT r3 #4): the LS train chain at
    n_units=256 / 4+2 layers / recurrent_chunk_size=500 / B=4 / T up to 1500
    — >=2 full chunk-500 boundaries, so the GRADIENT path through the
    chunkwise cross-chunk recursion and its detached renormalizers
    (LS-EEND/nnet/modules/retention.py:146-194) and the sum-len^2 masked
    emb loss (onl_conformer_...emb_loss_mask.py:91-113) is pinned at the
    shapes the published DERs were produced at (the small train golden
    never fires the recursion: T=16 < one chunk).

    One step, dropout=0 (RNG-free): losses + gradients.  Weights are
    f16-rounded so both frameworks compute from bit-identical f32 values;
    decoder gradients ship f32 (the chunk-recursion path under test),
    encoder/frontend gradients ship f16 (global-coverage safety net, f16
    quantization ~5e-4 relative dominates the comparison tolerance there).
    """
    torch.manual_seed(13)
    sys.path.insert(0, "/root/reference/LS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    from nnet.model.onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask import (
        OnlineConformerRetentionDADiarization as LS)

    T_list, n_spk_list = [1500, 1000, 1200, 1137], [5, 3, 8, 6]
    ls = LS(n_speakers=8, in_size=345, n_units=256, n_heads=4, enc_n_layers=4,
            dec_n_layers=2, dropout=0.0, max_seqlen=max(T_list),
            recurrent_chunk_size=500, feed_forward_expansion_factor=4,
            dec_dim_feedforward=2048, conv_kernel_size=16, conv_delay=9)
    with torch.no_grad():
        for blk in ls.enc.encoder.layers:
            bn = blk.sequential[2].module.sequential[5]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    _round_f16(ls)
    feats, labels = _make_batch(4321, T_list, n_spk_list, in_size=345)
    feats = [(f * 0.7).half().float() for f in feats]

    standard_loss = _ref_standard_loss()
    ls.train()
    sd0 = {k: (v.detach().half().numpy() if v.is_floating_point()
               else v.detach().numpy())
           for k, v in ls.state_dict().items()}
    tgt = _label_protocol(labels, T_list, n_spk_list)
    preds, emb_loss, _, _ = ls(feats, tgt=tgt, ilens=T_list)
    pit_loss = standard_loss(preds, tgt, label_delay=0)
    (pit_loss + emb_loss).backward()
    grads = {}
    for k, p in ls.named_parameters():
        if p.grad is None:
            continue
        g = p.grad.detach().numpy()
        grads[k] = (g.copy() if k.startswith(("dec", "cnn"))
                    else g.astype(np.float16))

    B, Tm, Sm = len(feats), max(T_list), max(n_spk_list)
    feats_pad = np.zeros((B, Tm, 345), np.float16)
    labels_pad = np.zeros((B, Tm, Sm), np.float32)
    for b in range(B):
        feats_pad[b, :T_list[b]] = feats[b].numpy().astype(np.float16)
        labels_pad[b, :T_list[b], :n_spk_list[b]] = labels[b].numpy()
    np.savez_compressed(
        "tests/goldens/ls_train_prod.npz", feats=feats_pad, labels=labels_pad,
        lens=np.asarray(T_list), n_spk=np.asarray(n_spk_list),
        losses=np.asarray([float(pit_loss), float(emb_loss),
                           float(pit_loss + emb_loss)], np.float64),
        **{"sd__" + k: v for k, v in sd0.items()},
        **{"gr__" + k: v for k, v in grads.items()})
    sys.path.remove("/root/reference/LS-EEND")


def _round_f16(model):
    """Round every parameter/BN buffer to float16-representable values so the
    golden can SHIP the state dict as f16 (half the bytes) while both sides
    compute from bit-identical f32 weights."""
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(p.half().float())
        for b in model.buffers():
            if b.is_floating_point():
                b.copy_(b.half().float())


def prod_goldens():
    """Production-shape eval goldens: n_units=256, production layer counts,
    T>=1500 with >=3 chunk boundaries at recurrent_chunk_size=500 — the
    shapes the published DERs were produced at. Pins the chunkwise
    cross-chunk recursion (LS-EEND/nnet/modules/retention.py:146-194) and
    the chunk-multiple padding (onl_conformer...py:131-134) at size.
    Toy goldens (model_goldens) can't see accumulation drift here."""
    torch.manual_seed(11)
    sys.path.insert(0, "/root/reference/FS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    from nnet.model.onl_tfm_enc_1dcnn_enc_linear_non_autoreg_pos_enc_l2norm import (
        OnlineTransformerDADiarization as FS)

    T = 1500
    fs = FS(n_speakers=4, in_size=345, n_units=256, n_heads=4, enc_n_layers=4,
            dec_n_layers=2, dropout=0.1, has_mask=True, max_seqlen=T,
            dec_dim_feedforward=2048, conv_delay=9).eval()
    with torch.no_grad():
        fs.enc.bn.running_mean.uniform_(-0.5, 0.5)
        fs.enc.bn.running_var.uniform_(0.5, 1.5)
    _round_f16(fs)
    x = (torch.randn(1, T, 345) * 0.7).half().float()
    with torch.no_grad():
        out, emb, _ = fs.test([x[0]], [T], max_nspks=6)
    sd = {k: v.half().numpy() if v.is_floating_point() else v.numpy()
          for k, v in fs.state_dict().items()}
    np.savez("tests/goldens/fs_model_prod.npz", x=x.numpy().astype(np.float16),
             logits=torch.stack(out).numpy(), emb=torch.stack(emb).numpy(),
             **{"sd__" + k: v for k, v in sd.items()})
    sys.path.remove("/root/reference/FS-EEND")

    torch.manual_seed(12)
    sys.path.insert(0, "/root/reference/LS-EEND")
    for mod in list(sys.modules):
        if mod.startswith("nnet"):
            del sys.modules[mod]
    from nnet.model.onl_conformer_retention_enc_1dcnn_tfm_retention_enc_linear_non_autoreg_pos_enc_l2norm_emb_loss_mask import (
        OnlineConformerRetentionDADiarization as LS)

    T2 = 1537   # pads to 2000: 3 chunk boundaries + a ragged final chunk
    ls = LS(n_speakers=8, in_size=345, n_units=256, n_heads=4, enc_n_layers=4,
            dec_n_layers=2, dropout=0.1, max_seqlen=T2, recurrent_chunk_size=500,
            feed_forward_expansion_factor=4, dec_dim_feedforward=2048,
            conv_kernel_size=16, conv_delay=9).eval()
    with torch.no_grad():
        for blk in ls.enc.encoder.layers:
            bn = blk.sequential[2].module.sequential[5]
            bn.running_mean.uniform_(-0.5, 0.5)
            bn.running_var.uniform_(0.5, 1.5)
    _round_f16(ls)
    x2 = (torch.randn(1, T2, 345) * 0.7).half().float()
    with torch.no_grad():
        out2, emb2, _ = ls.test([x2[0]], [T2], max_nspks=10)
    sd2 = {k: v.half().numpy() if v.is_floating_point() else v.numpy()
           for k, v in ls.state_dict().items()}
    np.savez("tests/goldens/ls_model_prod.npz", x=x2.numpy().astype(np.float16),
             logits=torch.stack(out2).numpy(), emb=torch.stack(emb2).numpy(),
             **{"sd__" + k: v for k, v in sd2.items()})
    sys.path.remove("/root/reference/LS-EEND")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="regenerate one group (function name)")
    a = ap.parse_args()
    groups = [retention_goldens, model_goldens, train_goldens, prod_goldens,
              prod_train_goldens]
    for fn in groups:
        if a.only and fn.__name__ != a.only:
            continue
        print(f"-> {fn.__name__}", flush=True)
        fn()
    print("goldens regenerated under tests/goldens/")
