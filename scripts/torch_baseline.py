"""PyTorch-CPU throughput baseline for bench.py's vs_baseline ratio.

A compact, independent torch implementation of the STAGE training step at
the reference's headline shapes (my own formulation — written from the
architecture description, used only to time torch-CPU forward+backward).
It is *favorable to the baseline*: the reference's python-loop attention
loss and host-synced span search (its real bottlenecks) are replaced by
vectorized torch ops, so the measured baseline is an upper bound on the
reference's CPU throughput.

Run: python scripts/torch_baseline.py [n_steps]  -> prints qa_pairs/sec.
"""
from __future__ import annotations

import json
import math
import sys
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

B, A, LQA, LI, LS, LR = 16, 5, 40, 50, 50, 25
DE, DV, H = 768, 300, 128


def dsconv(d, k):
    return nn.Sequential(
        nn.Conv1d(d, d, k, padding=k // 2, groups=d),
        nn.Conv1d(d, d, 1), nn.ReLU())


class Encoder(nn.Module):
    def __init__(self, d, k, n_conv=2):
        super().__init__()
        self.norms = nn.ModuleList([nn.LayerNorm(d) for _ in range(n_conv)])
        self.convs = nn.ModuleList([dsconv(d, k) for _ in range(n_conv)])
        pe = torch.zeros(500, d)
        pos = torch.arange(500).float().unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2).float() * -(math.log(1e4) / d))
        pe[:, 0::2], pe[:, 1::2] = torch.sin(pos * div), torch.cos(pos * div)
        self.register_buffer("pe", pe)
        self.final = nn.LayerNorm(d)

    def forward(self, x):  # (N, L, D)
        x = x + self.pe[: x.shape[1]]
        for norm, conv in zip(self.norms, self.convs):
            r = x
            x = norm(x)
            x = conv(x.transpose(1, 2)).transpose(1, 2) + r
        return self.final(x)


class TorchSTAGE(nn.Module):
    def __init__(self):
        super().__init__()
        def bridge(din, dout):
            return nn.Sequential(nn.LayerNorm(din), nn.Dropout(0.1),
                                 nn.Linear(din, dout), nn.ReLU(),
                                 nn.LayerNorm(dout))
        self.bert_fc = bridge(DE, 300)
        self.vid_fc = bridge(DV, 300)
        self.embed = nn.Sequential(nn.Dropout(0.1), nn.Linear(300, H),
                                   nn.ReLU(), nn.LayerNorm(H))
        self.enc = Encoder(H, 7)
        self.c2q = nn.Sequential(nn.LayerNorm(3 * H), nn.Dropout(0.1),
                                 nn.Linear(3 * H, H), nn.ReLU())
        self.concat_fc = bridge(3 * H, H)
        self.cls_enc = Encoder(H, 5)
        self.proj = nn.Sequential(nn.LayerNorm(H), nn.Dropout(0.1),
                                  nn.Linear(H, H), nn.ReLU())
        self.t_st = nn.Sequential(nn.LayerNorm(H), nn.Linear(H, 1))
        self.t_ed = nn.Sequential(nn.LayerNorm(H), nn.Linear(H, 1))
        self.classifier = nn.Sequential(nn.LayerNorm(2 * H), nn.Linear(2 * H, 1))

    def attend(self, qa, ctx):  # (B,A,1,LQA,H) x (B,1,LI,Lc,H)
        qn = F.normalize(qa, dim=-1)
        cn = F.normalize(ctx, dim=-1)
        s = torch.matmul(qn, cn.transpose(-1, -2))        # (B,A,LI,LQA,Lc)
        a = torch.matmul(F.softmax(s * 10.0, -1), ctx)
        qa_b = qa.expand(-1, -1, ctx.shape[2], -1, -1)
        return self.c2q(torch.cat([qa_b, a, qa_b * a], -1)), s

    def forward(self, qas_bert, sub_bert, vid):
        qa = self.enc(self.embed(self.bert_fc(qas_bert)).view(B * A, LQA, H))
        qa = qa.view(B, A, 1, LQA, H)
        sub = self.enc(self.embed(self.bert_fc(sub_bert)).view(B * LI, LS, H))
        sub = sub.view(B, 1, LI, LS, H)
        vidE = self.enc(self.embed(self.vid_fc(F.normalize(vid, dim=-1)))
                        .view(B * LI, LR, H)).view(B, 1, LI, LR, H)
        att_sub, _ = self.attend(qa, sub)
        att_vid, s_vid = self.attend(qa, vidE)
        st = self.concat_fc(torch.cat([att_sub, att_vid,
                                       att_sub * att_vid], -1))
        st = self.cls_enc(st.view(B * A * LI, LQA, H)).max(1)[0]
        st = st.view(B, A, LI, H)
        st = st + self.proj(st)
        t = torch.cat([self.t_st(st), self.t_ed(st)], -1)  # (B,A,LI,2)
        pooled = torch.cat([st.max(2)[0], st.max(2)[0]], -1)
        scores = self.classifier(pooled).squeeze(-1)       # (B,A)
        return scores, t, s_vid


def measure(n_steps=3):
    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())
    model = TorchSTAGE()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=3e-7)
    qas_bert = torch.randn(B, A, LQA, DE)
    sub_bert = torch.randn(B, LI, LS, DE)
    vid = torch.randn(B, LI, LR, DV)
    target = torch.randint(0, A, (B,))
    ts_st = torch.randint(0, LI, (B,))
    ce = nn.CrossEntropyLoss(reduction="sum")
    # warmup
    scores, t, s = model(qas_bert, sub_bert, vid)
    loss = ce(scores, target) + 0.5 * ce(t[torch.arange(B), target, :, 0],
                                         ts_st) + 0.1 * s.abs().mean()
    loss.backward()
    opt.step()
    t0 = time.time()
    for _ in range(n_steps):
        opt.zero_grad()
        scores, t, s = model(qas_bert, sub_bert, vid)
        loss = ce(scores, target) + 0.5 * ce(
            t[torch.arange(B), target, :, 0], ts_st) + 0.1 * s.abs().mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()
    dt = time.time() - t0
    return B * n_steps / dt


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    qps = measure(n)
    print(json.dumps({"torch_cpu_qa_pairs_per_sec": qps}))
