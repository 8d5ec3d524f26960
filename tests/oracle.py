"""Independent PyTorch-autograd oracle for ASG.

A deliberately simple, obviously-correct implementation of the ASG math
(forward alpha recursions only + torch autograd for gradients) used to
cross-check the JAX framework on randomized shapes, including ragged
lengths.  It shares no code or structure with either implementation under
test: scores come from alpha at the true sequence end (not beta), and all
gradients come from autograd (no marginals).  fp64 throughout.
"""

import torch


def fcc_oracle(transition, inputs, input_lengths):
    """Log-partition scores per batch element via forward recursion.

    transition: (N, N) [i, j] = score j -> i.  inputs: (T, B, N).
    """
    T, B, N = inputs.shape
    scores = []
    for b in range(B):
        L = int(input_lengths[b])
        alpha = inputs[0, b]
        for t in range(1, L):
            alpha = inputs[t, b] + torch.logsumexp(transition + alpha[None, :], dim=1)
        scores.append(torch.logsumexp(alpha, dim=0))
    return torch.stack(scores)


def fac_oracle(transition, inputs, targets, input_lengths, target_lengths):
    """Force-aligned scores per batch element via forward recursion."""
    T, B, N = inputs.shape
    scores = []
    for b in range(B):
        L = int(input_lengths[b])
        S = int(target_lengths[b])
        y = targets[b, :S].tolist()
        # Track only reachable states (no -inf entries: torch autograd
        # produces NaN through logaddexp(-inf, x)).
        alpha = {0: inputs[0, b, y[0]]}
        for t in range(1, L):
            new = {}
            lo_s = max(0, S - (L - t))  # must still reach s=S-1 by t=L-1
            hi_s = min(t, S - 1)
            for s in range(lo_s, hi_s + 1):
                terms = []
                if s in alpha:
                    terms.append(alpha[s] + transition[y[s], y[s]])
                if s - 1 in alpha:
                    terms.append(alpha[s - 1] + transition[y[s], y[s - 1]])
                tot = terms[0] if len(terms) == 1 else torch.logaddexp(*terms)
                new[s] = tot + inputs[t, b, y[s]]
            alpha = new
        scores.append(alpha[S - 1])
    return torch.stack(scores)


def asg_oracle(transition, inputs, targets, input_lengths, target_lengths):
    full = fcc_oracle(transition, inputs, input_lengths)
    aligned = fac_oracle(transition, inputs, targets, input_lengths, target_lengths)
    return full - aligned


def viterbi_oracle(transition, inputs, input_lengths):
    """Best-path scores and paths (list of label lists) per batch element."""
    T, B, N = inputs.shape
    scores, paths = [], []
    for b in range(B):
        L = int(input_lengths[b])
        delta = inputs[0, b].clone()
        back = []
        for t in range(1, L):
            cand = transition + delta[None, :]  # (N_to, N_from)
            best, arg = cand.max(dim=1)
            delta = inputs[t, b] + best
            back.append(arg)
        score, last = delta.max(dim=0)
        path = [int(last)]
        for arg in reversed(back):
            path.append(int(arg[path[-1]]))
        scores.append(score)
        paths.append(list(reversed(path)))
    return torch.stack(scores), paths
