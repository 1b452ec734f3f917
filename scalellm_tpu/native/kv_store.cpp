// Native KV block store: allocator + refcounts + prefix-cache trie.
//
// TPU-native equivalent of the reference's C++ KV memory subsystem
// (reference: src/memory/block_allocator.h:14, block.h:13,
// prefix_cache.h:12-110). The device-side KV pages live in JAX arrays; this
// module owns the HOST-side bookkeeping — the free list, per-block
// refcounts, and the token-trie with LRU eviction — which sits on the
// scheduler's per-step critical path at high request rates.
//
// Exposed as the `_scalellm_native` CPython module (no pybind11 in this
// image; raw CPython C API). Semantics mirror scalellm_tpu/memory/*.py
// exactly; tests run both implementations against each other.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <deque>
#include <map>
#include <memory>
#include <unordered_map>
#include <vector>

namespace {

using TokenVec = std::vector<int64_t>;

struct VecHash {
  size_t operator()(const TokenVec& v) const {
    size_t h = 1469598103934665603ull;
    for (int64_t t : v) {
      h ^= static_cast<size_t>(t) + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
    }
    return h;
  }
};

struct Node {
  TokenVec tokens;             // block-aligned run of token ids
  std::vector<int> blocks;     // block ids covering `tokens`
  Node* parent = nullptr;
  std::unordered_map<TokenVec, Node*, VecHash> children;  // key: first block
  uint64_t last_access = 0;
};

class KVStore {
 public:
  KVStore(int total_blocks, int block_size)
      : block_size_(block_size), refs_(total_blocks, 0) {
    for (int i = total_blocks - 1; i >= 0; --i) free_list_.push_back(i);
    root_ = new Node();
  }
  ~KVStore() { free_tree(root_); }

  int block_size() const { return block_size_; }
  int num_free() const { return static_cast<int>(free_list_.size()); }
  int total() const { return static_cast<int>(refs_.size()); }
  int num_used() const { return total() - num_free(); }
  int cache_blocks() const { return cache_blocks_; }

  // ------------------------------------------------------------- allocator

  bool allocate(int n, std::vector<int>* out) {
    if (static_cast<int>(free_list_.size()) < n) return false;
    for (int i = 0; i < n; ++i) {
      int id = free_list_.back();
      free_list_.pop_back();
      refs_[id] = 1;
      out->push_back(id);
    }
    return true;
  }

  void inc_ref(int id) { refs_[id] += 1; }

  void dec_ref(int id) {
    if (--refs_[id] == 0) {
      // Block 0 is the reserved padding block (block_manager.cpp:40-42);
      // multi-step decode writes past-end KV through the zero-padded
      // block-table tail into it, so it must never re-enter the pool.
      assert(id != 0 && "padding block 0 must stay reserved");
      free_list_.push_back(id);
    }
  }

  int ref_count(int id) const { return refs_[id]; }

  // ------------------------------------------------------------ prefix trie
  // (reference: prefix_cache.h:12-110 — children keyed by the child's first
  // BLOCK of token ids so a child hit always matches >= 1 whole block)

  // Longest block-aligned prefix match; takes a ref per returned block.
  void match(const TokenVec& tokens, std::vector<int>* out) {
    size_t n = (tokens.size() / block_size_) * block_size_;
    Node* node = root_;
    size_t pos = 0;
    while (pos < n) {
      TokenVec key(tokens.begin() + pos, tokens.begin() + pos + block_size_);
      auto it = node->children.find(key);
      if (it == node->children.end()) break;
      Node* child = it->second;
      size_t k = 0;
      while ((k + 1) * block_size_ <= child->tokens.size() &&
             pos + (k + 1) * block_size_ <= n &&
             std::equal(child->tokens.begin() + k * block_size_,
                        child->tokens.begin() + (k + 1) * block_size_,
                        tokens.begin() + pos + k * block_size_)) {
        ++k;
      }
      if (k == 0) break;
      child->last_access = ++clock_;
      for (size_t i = 0; i < k; ++i) {
        inc_ref(child->blocks[i]);
        out->push_back(child->blocks[i]);
      }
      pos += k * block_size_;
      if (k * block_size_ < child->tokens.size()) break;
      node = child;
    }
  }

  // Cache the block-aligned prefix; takes its own ref on new blocks.
  int insert(const TokenVec& tokens, const std::vector<int>& blocks) {
    size_t n_blocks =
        std::min(tokens.size() / block_size_, blocks.size());
    if (n_blocks == 0) return 0;
    Node* node = root_;
    size_t pos = 0, bi = 0;
    int added = 0;
    while (bi < n_blocks) {
      TokenVec key(tokens.begin() + pos, tokens.begin() + pos + block_size_);
      auto it = node->children.find(key);
      if (it == node->children.end()) {
        Node* leaf = new Node();
        leaf->tokens.assign(tokens.begin() + pos,
                            tokens.begin() + n_blocks * block_size_);
        for (size_t i = bi; i < n_blocks; ++i) {
          inc_ref(blocks[i]);
          leaf->blocks.push_back(blocks[i]);
        }
        leaf->parent = node;
        leaf->last_access = ++clock_;
        node->children[key] = leaf;
        added += static_cast<int>(n_blocks - bi);
        cache_blocks_ += static_cast<int>(n_blocks - bi);
        return added;
      }
      Node* child = it->second;
      size_t max_k = std::min(child->tokens.size() / block_size_,
                              n_blocks - bi);
      size_t k = 0;
      while (k < max_k &&
             std::equal(child->tokens.begin() + k * block_size_,
                        child->tokens.begin() + (k + 1) * block_size_,
                        tokens.begin() + pos + k * block_size_)) {
        ++k;
      }
      child->last_access = ++clock_;
      if (k < child->tokens.size() / block_size_ && k < n_blocks - bi) {
        split(child, k);
      }
      pos += k * block_size_;
      bi += k;
      node = child;
    }
    return added;
  }

  int evict(int want) {
    int evicted = 0;
    while (evicted < want) {
      Node* victim = pick_lru_leaf();
      if (victim == nullptr) break;
      while (!victim->blocks.empty() && evicted < want) {
        int blk = victim->blocks.back();
        if (refs_[blk] > 1) break;  // in use by a live sequence
        victim->blocks.pop_back();
        victim->tokens.resize(victim->blocks.size() * block_size_);
        dec_ref(blk);
        --cache_blocks_;
        ++evicted;
      }
      if (victim->blocks.empty()) {
        unlink(victim);
      } else {
        victim->last_access = ++clock_;
        if (evicted < want && has_other_candidates(victim)) continue;
        break;
      }
    }
    return evicted;
  }

 private:
  void split(Node* node, size_t k_blocks) {
    size_t cut = k_blocks * block_size_;
    Node* tail = new Node();
    tail->tokens.assign(node->tokens.begin() + cut, node->tokens.end());
    tail->blocks.assign(node->blocks.begin() + k_blocks, node->blocks.end());
    node->tokens.resize(cut);
    node->blocks.resize(k_blocks);
    tail->children = std::move(node->children);
    for (auto& kv : tail->children) kv.second->parent = tail;
    tail->parent = node;
    tail->last_access = node->last_access;
    node->children.clear();
    TokenVec key(tail->tokens.begin(), tail->tokens.begin() + block_size_);
    node->children[key] = tail;
  }

  Node* pick_lru_leaf() {
    Node* best = nullptr;
    std::deque<Node*> stack{root_};
    while (!stack.empty()) {
      Node* node = stack.back();
      stack.pop_back();
      for (auto& kv : node->children) stack.push_back(kv.second);
      if (node == root_ || !node->children.empty()) continue;
      if (node->blocks.empty()) continue;
      if (refs_[node->blocks.back()] > 1) continue;
      if (best == nullptr || node->last_access < best->last_access) best = node;
    }
    return best;
  }

  bool has_other_candidates(Node* excluded) {
    std::deque<Node*> stack{root_};
    while (!stack.empty()) {
      Node* node = stack.back();
      stack.pop_back();
      for (auto& kv : node->children) stack.push_back(kv.second);
      if (node == root_ || node == excluded || !node->children.empty()) continue;
      if (!node->blocks.empty() && refs_[node->blocks.back()] == 1) return true;
    }
    return false;
  }

  void unlink(Node* victim) {
    Node* parent = victim->parent;
    for (auto it = parent->children.begin(); it != parent->children.end(); ++it) {
      if (it->second == victim) {
        parent->children.erase(it);
        break;
      }
    }
    delete victim;
  }

  void free_tree(Node* node) {
    for (auto& kv : node->children) free_tree(kv.second);
    delete node;
  }

  int block_size_;
  std::vector<int> refs_;
  std::vector<int> free_list_;
  Node* root_;
  uint64_t clock_ = 0;
  int cache_blocks_ = 0;
};

// ------------------------------------------------------------------ binding

struct PyKVStore {
  PyObject_HEAD
  KVStore* store;
};

static PyObject* kvstore_new(PyTypeObject* type, PyObject* args, PyObject*) {
  int total_blocks, block_size;
  if (!PyArg_ParseTuple(args, "ii", &total_blocks, &block_size)) return nullptr;
  PyKVStore* self = reinterpret_cast<PyKVStore*>(type->tp_alloc(type, 0));
  if (self != nullptr) self->store = new KVStore(total_blocks, block_size);
  return reinterpret_cast<PyObject*>(self);
}

static void kvstore_dealloc(PyKVStore* self) {
  delete self->store;
  Py_TYPE(self)->tp_free(reinterpret_cast<PyObject*>(self));
}

static bool to_token_vec(PyObject* seq, TokenVec* out) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence of ints");
  if (fast == nullptr) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    out->push_back(PyLong_AsLongLong(PySequence_Fast_GET_ITEM(fast, i)));
  }
  Py_DECREF(fast);
  return !PyErr_Occurred();
}

static bool to_int_vec(PyObject* seq, std::vector<int>* out) {
  PyObject* fast = PySequence_Fast(seq, "expected a sequence of ints");
  if (fast == nullptr) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    out->push_back(static_cast<int>(
        PyLong_AsLong(PySequence_Fast_GET_ITEM(fast, i))));
  }
  Py_DECREF(fast);
  return !PyErr_Occurred();
}

static PyObject* int_vec_to_list(const std::vector<int>& v) {
  PyObject* list = PyList_New(v.size());
  for (size_t i = 0; i < v.size(); ++i) {
    PyList_SET_ITEM(list, i, PyLong_FromLong(v[i]));
  }
  return list;
}

static PyObject* kvstore_allocate(PyKVStore* self, PyObject* arg) {
  int n = static_cast<int>(PyLong_AsLong(arg));
  if (PyErr_Occurred()) return nullptr;
  std::vector<int> out;
  if (!self->store->allocate(n, &out)) {
    Py_RETURN_NONE;  // not enough free blocks
  }
  return int_vec_to_list(out);
}

static PyObject* kvstore_inc_ref(PyKVStore* self, PyObject* arg) {
  self->store->inc_ref(static_cast<int>(PyLong_AsLong(arg)));
  if (PyErr_Occurred()) return nullptr;
  Py_RETURN_NONE;
}

static PyObject* kvstore_dec_ref(PyKVStore* self, PyObject* arg) {
  self->store->dec_ref(static_cast<int>(PyLong_AsLong(arg)));
  if (PyErr_Occurred()) return nullptr;
  Py_RETURN_NONE;
}

static PyObject* kvstore_ref_count(PyKVStore* self, PyObject* arg) {
  int r = self->store->ref_count(static_cast<int>(PyLong_AsLong(arg)));
  if (PyErr_Occurred()) return nullptr;
  return PyLong_FromLong(r);
}

static PyObject* kvstore_match(PyKVStore* self, PyObject* arg) {
  TokenVec tokens;
  if (!to_token_vec(arg, &tokens)) return nullptr;
  std::vector<int> out;
  self->store->match(tokens, &out);
  return int_vec_to_list(out);
}

static PyObject* kvstore_insert(PyKVStore* self, PyObject* args) {
  PyObject* tokens_obj;
  PyObject* blocks_obj;
  if (!PyArg_ParseTuple(args, "OO", &tokens_obj, &blocks_obj)) return nullptr;
  TokenVec tokens;
  std::vector<int> blocks;
  if (!to_token_vec(tokens_obj, &tokens) || !to_int_vec(blocks_obj, &blocks))
    return nullptr;
  return PyLong_FromLong(self->store->insert(tokens, blocks));
}

static PyObject* kvstore_evict(PyKVStore* self, PyObject* arg) {
  int n = static_cast<int>(PyLong_AsLong(arg));
  if (PyErr_Occurred()) return nullptr;
  return PyLong_FromLong(self->store->evict(n));
}

static PyObject* kvstore_stats(PyKVStore* self, PyObject*) {
  return Py_BuildValue(
      "{s:i,s:i,s:i,s:i}", "num_free", self->store->num_free(), "num_used",
      self->store->num_used(), "total", self->store->total(), "cache_blocks",
      self->store->cache_blocks());
}

static PyMethodDef kvstore_methods[] = {
    {"allocate", reinterpret_cast<PyCFunction>(kvstore_allocate), METH_O,
     "allocate(n) -> list[int] | None"},
    {"inc_ref", reinterpret_cast<PyCFunction>(kvstore_inc_ref), METH_O, ""},
    {"dec_ref", reinterpret_cast<PyCFunction>(kvstore_dec_ref), METH_O, ""},
    {"ref_count", reinterpret_cast<PyCFunction>(kvstore_ref_count), METH_O, ""},
    {"match", reinterpret_cast<PyCFunction>(kvstore_match), METH_O,
     "match(tokens) -> list[int] (refs taken)"},
    {"insert", reinterpret_cast<PyCFunction>(kvstore_insert), METH_VARARGS,
     "insert(tokens, block_ids) -> int added"},
    {"evict", reinterpret_cast<PyCFunction>(kvstore_evict), METH_O,
     "evict(n) -> int evicted"},
    {"stats", reinterpret_cast<PyCFunction>(kvstore_stats), METH_NOARGS, ""},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject KVStoreType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

static PyModuleDef native_module = {
    PyModuleDef_HEAD_INIT, "_scalellm_native",
    "Native KV block allocator + prefix-cache trie", -1, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__scalellm_native(void) {
  KVStoreType.tp_name = "_scalellm_native.KVStore";
  KVStoreType.tp_basicsize = sizeof(PyKVStore);
  KVStoreType.tp_flags = Py_TPFLAGS_DEFAULT;
  KVStoreType.tp_new = kvstore_new;
  KVStoreType.tp_dealloc = reinterpret_cast<destructor>(kvstore_dealloc);
  KVStoreType.tp_methods = kvstore_methods;
  if (PyType_Ready(&KVStoreType) < 0) return nullptr;
  PyObject* m = PyModule_Create(&native_module);
  if (m == nullptr) return nullptr;
  Py_INCREF(&KVStoreType);
  PyModule_AddObject(m, "KVStore", reinterpret_cast<PyObject*>(&KVStoreType));
  return m;
}
