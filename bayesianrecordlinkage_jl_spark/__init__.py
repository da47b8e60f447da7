"""PySpark-native record-linkage engine.

A from-scratch rebuild (NOT a port) of the capabilities of
brendanstats/BayesianRecordLinkage.jl (reference at /root/reference):
blocking -> Fellegi-Sunter pairwise scoring over categorical comparison
vectors (Sadinle 2017) -> one-to-one resolution -> transitive clustering,
re-expressed Spark-first (DataFrame/Catalyst; Arrow-batched pandas UDFs
only where built-ins cannot express the semantics).

Reference entry points mirrored (see SURVEY.md section 2):
  - ComparisonSummary / SparseComparisonSummary  -> operators.comparison_summary
  - bipartite_cluster / iterative_bipartite_cluster2 -> operators.connected_components
  - max_C_cluster_* (LSAP per component)         -> operators.assignment
  - estimate_EM / max_MU                          -> operators.em
  - penalized_likelihood_search_*                 -> operators.map_solver
  - weights_vector / shrink_weights / posterior   -> functions.weights
  - levOrd / boolOrd comparators                  -> functions.comparators
  - read_write_h5 checkpoints                     -> sources.checkpoint
"""

__version__ = "0.1.0"
