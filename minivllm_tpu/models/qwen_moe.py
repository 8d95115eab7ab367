"""Qwen3-MoE model family (Qwen3MoeForCausalLM, e.g. Qwen3-30B-A3B).

Beyond reference parity — the reference supports no MoE models
(SURVEY.md §2.2 "Expert parallelism / MoE: NO"). The dense Qwen3 graph is
inherited unchanged (RoPE GQA attention with q/k-norm, pre-RMSNorm); only
the per-layer MLP is replaced by a routed sparse MoE block
(`ops/moe.moe_mlp`: fp32 router softmax -> top-k -> dropless
sorted grouped-matmul experts).

Mixed dense/sparse stacks (`mlp_only_layers`, `decoder_sparse_step`) are
supported: the HF rule — layer i is sparse iff i not in mlp_only_layers
and (i + 1) % decoder_sparse_step == 0 — becomes a STATIC per-layer mask;
the scanned layer body branches with `lax.cond` on the mask entry (one
branch executes per layer), dense layers carrying zero-filled expert
slabs and sparse layers zero-filled dense kernels in the stacked params
(the price of keeping one homogeneous `lax.scan`; released Qwen3-MoE
checkpoints are fully sparse and pay nothing).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from minivllm_tpu.models.qwen import QwenForCausalLM
from minivllm_tpu.ops.moe import moe_mlp

__all__ = ["QwenMoeForCausalLM"]


class QwenMoeForCausalLM(QwenForCausalLM):
    def __init__(self, hf_config, dtype=jnp.bfloat16, attn_backend=None) -> None:
        super().__init__(hf_config, dtype, attn_backend)
        c = hf_config
        self.num_experts = c.num_experts
        self.top_k = c.num_experts_per_tok
        self.moe_intermediate_size = c.moe_intermediate_size
        self.norm_topk_prob = bool(getattr(c, "norm_topk_prob", True))
        # HF Qwen3MoeDecoderLayer rule (modeling_qwen3_moe.py): dense MLP
        # unless the layer is sparse-eligible.
        step = int(getattr(c, "decoder_sparse_step", 1) or 1)
        only = set(getattr(c, "mlp_only_layers", None) or [])
        self.dense_layer_mask = np.array(
            [
                (i in only)
                or not (self.num_experts > 0 and (i + 1) % step == 0)
                for i in range(self.num_layers)
            ],
            dtype=bool,
        )
        self.has_dense = bool(self.dense_layer_mask.any())

    # -- parameter structure hooks ------------------------------------------

    def _init_mlp_params(self, normal) -> dict:
        L, D = self.num_layers, self.hidden_size
        E, I = self.num_experts, self.moe_intermediate_size
        params = {
            "router": normal(L, D, E),
            "moe_gate": normal(L, E, D, I),
            "moe_up": normal(L, E, D, I),
            "moe_down": normal(L, E, I, D),
        }
        if self.has_dense:
            Id = self.intermediate_size
            params["gate_proj"] = normal(L, D, Id)
            params["up_proj"] = normal(L, D, Id)
            params["down_proj"] = normal(L, Id, D)
        return params

    def _mlp_weight_rules(self):
        T = np.transpose
        rules = [
            ("mlp.gate.weight", ("layers", "router"), T),
            (r"mlp.experts.{E}.gate_proj.weight", ("layers", "moe_gate"), T),
            (r"mlp.experts.{E}.up_proj.weight", ("layers", "moe_up"), T),
            (r"mlp.experts.{E}.down_proj.weight", ("layers", "moe_down"), T),
        ]
        if self.has_dense:
            # Dense layers' kernels; the collector zero-fills the sparse
            # layers' rows (and vice versa) — each layer reads only its
            # own branch.
            rules += [
                ("mlp.gate_proj.weight", ("layers", "gate_proj"), T),
                ("mlp.up_proj.weight", ("layers", "up_proj"), T),
                ("mlp.down_proj.weight", ("layers", "down_proj"), T),
            ]
        return rules

    def _mlp_quant_plan(self) -> dict:
        # (L, E, in, out): absmax over the contraction axis 2; the router
        # stays full precision (tiny, and routing is fp32 anyway).
        plan = {
            ("layers", "moe_gate"): (2,),
            ("layers", "moe_up"): (2,),
            ("layers", "moe_down"): (2,),
        }
        if self.has_dense:
            plan[("layers", "gate_proj")] = (1,)
            plan[("layers", "up_proj")] = (1,)
            plan[("layers", "down_proj")] = (1,)
        return plan

    def _mlp_pspecs(self) -> dict:
        from jax.sharding import PartitionSpec as P

        # Megatron pattern inside each expert: shard the expert hidden dim
        # over tp (gate/up: out-dim; down: in-dim -> psum). The expert axis
        # is additionally sharded over the "ep" mesh axis when present
        # (parallel/sharding.make_mesh); on a pure-tp mesh "ep" has size 1.
        specs = {
            "router": P("pp", None, None),
            "moe_gate": P("pp", "ep", None, "tp"),
            "moe_up": P("pp", "ep", None, "tp"),
            "moe_down": P("pp", "ep", "tp", None),
        }
        if self.has_dense:
            specs["gate_proj"] = P("pp", None, "tp")
            specs["up_proj"] = P("pp", None, "tp")
            specs["down_proj"] = P("pp", "tp", None)
        return specs

    # -- forward hook --------------------------------------------------------

    def _moe_impl(self) -> str:
        """Grouped-matmul backend for the expert dispatch.

        The Pallas kernel (ops/pallas/moe_gmm.py) engages with the Pallas
        attention backend, both mesh-less and — via the shard_map wrapper
        ops/moe.moe_mlp_spmd — under dp/sp/ep/tp meshes (a pallas_call
        has no GSPMD partitioning rule, so the mesh path must make the
        partitioning explicit). pp meshes stay on lax.ragged_dot: the
        pipeline already drives the layer stack inside its own shard_map.
        MINIVLLM_MOE_IMPL=xla forces the XLA path (A/B benchmarking).
        """
        if os.environ.get("MINIVLLM_MOE_IMPL") == "xla":
            return "xla"
        b = self.attn_backend
        if b is None or b.name != "pallas":
            return "xla"
        return "pallas_interpret" if getattr(b, "interpret", False) else "pallas"

    def _mlp(self, lp: dict, h: jnp.ndarray) -> jnp.ndarray:
        from minivllm_tpu.ops.moe import moe_mlp_spmd, moe_supported

        impl = self._moe_impl()
        if self.has_dense:
            # Mixed dense/sparse stack: branch on the static per-layer
            # mask with lax.cond (self._layer_idx is the traced global
            # layer index set by run_layers; one branch executes per
            # layer). Under a mesh the sparse branch uses GSPMD
            # ragged_dot — nesting the MoE shard_map wrapper inside the
            # cond is not worth it for the rare mixed configs.
            from jax import lax

            is_dense = jnp.asarray(self.dense_layer_mask)[self._layer_idx]
            return lax.cond(
                is_dense,
                lambda x: QwenForCausalLM._mlp(self, lp, x),
                lambda x: moe_mlp(
                    x, lp["router"], lp["moe_gate"], lp["moe_up"],
                    lp["moe_down"], self.top_k, self.norm_topk_prob,
                    impl=impl if self.attn_backend is None
                    or getattr(self.attn_backend, "mesh", None) is None
                    else "xla",
                ),
                h,
            )
        mesh = getattr(self.attn_backend, "mesh", None) if impl != "xla" else None
        if mesh is not None:
            ep = mesh.shape.get("ep", 1)
            tp = mesh.shape.get("tp", 1)
            dp = mesh.shape.get("dp", 1)
            sp = mesh.shape.get("sp", 1)
            row_axis = "sp" if getattr(self, "_is_prefill", False) else "dp"
            rows_div = mesh.shape.get(row_axis, 1)
            rows_local = h.shape[0] // rows_div * self.top_k
            # Static gate: expert/tp divisibility, row-shard divisibility,
            # and kernel support at the LOCAL shard shapes. Fall through
            # to GSPMD ragged_dot otherwise (correct, slower).
            if (
                self.num_experts % ep == 0
                and self.moe_intermediate_size % tp == 0
                and h.shape[0] % rows_div == 0
                and moe_supported(
                    rows_local, h.dtype,
                    *self._local_expert_shapes(lp, ep, tp),
                )
            ):
                # Trace-time counter: tests assert the spmd kernel path
                # actually engaged rather than silently falling back.
                self._moe_spmd_traces = getattr(self, "_moe_spmd_traces", 0) + 1
                return moe_mlp_spmd(
                    mesh, h, lp["router"],
                    lp["moe_gate"], lp["moe_up"], lp["moe_down"],
                    self.top_k, self.norm_topk_prob, impl,
                    row_axis=row_axis,
                )
            impl = "xla"
        return moe_mlp(
            h,
            lp["router"],
            lp["moe_gate"],
            lp["moe_up"],
            lp["moe_down"],
            self.top_k,
            self.norm_topk_prob,
            impl=impl,
        )

    @staticmethod
    def _local_expert_shapes(lp: dict, ep: int, tp: int):
        """ShapeDtypeStructs of the per-(ep,tp)-shard expert weights."""
        import jax

        from minivllm_tpu.ops.quant import is_quantized

        def shard(w, i_axis):
            data = w["w"] if is_quantized(w) else w
            shape = list(data.shape)
            shape[0] //= ep
            shape[i_axis] //= tp
            return jax.ShapeDtypeStruct(tuple(shape), data.dtype)

        return (
            shard(lp["moe_gate"], 2),
            shard(lp["moe_up"], 2),
            shard(lp["moe_down"], 1),
        )
