"""Recursive JSON splitter (LangChain-style), re-implemented from the
semantics of ``deepdoc/parser/json_parser.py:25-120``:

  * lists are converted to index-keyed dicts first;
  * depth-first greedy packing: a (key, value) subtree joins the current
    chunk if its serialized size fits the remaining budget, else the chunk
    closes (when ≥ min) and the subtree is recursed into;
  * budget = 2 × max_chunk_size; min = max(max_chunk_size − 200, 50);
  * output = one JSON string per chunk (ensure_ascii=False).
"""

from __future__ import annotations

import json
from typing import Any

from ..textnorm.codec import decode_bytes


class JsonParser:
    def __init__(self, max_chunk_size: int = 2000,
                 min_chunk_size: int | None = None):
        self.max_chunk_size = max_chunk_size * 2
        self.min_chunk_size = (min_chunk_size if min_chunk_size is not None
                               else max(max_chunk_size - 200, 50))

    def __call__(self, binary=None, text: str | None = None) -> list[str]:
        txt = text if text is not None else decode_bytes(binary)
        data = json.loads(txt)
        chunks = self.split_json(data, True)
        return [json.dumps(c, ensure_ascii=False) for c in chunks if c]

    @staticmethod
    def _json_size(data: dict) -> int:
        return len(json.dumps(data, ensure_ascii=False))

    @staticmethod
    def _set_nested_dict(d: dict, path: list[str], value: Any) -> None:
        for key in path[:-1]:
            d = d.setdefault(key, {})
        d[path[-1]] = value

    def _list_to_dict_preprocessing(self, data: Any) -> Any:
        if isinstance(data, dict):
            return {k: self._list_to_dict_preprocessing(v)
                    for k, v in data.items()}
        if isinstance(data, list):
            return {str(i): self._list_to_dict_preprocessing(v)
                    for i, v in enumerate(data)}
        return data

    def _json_split(self, data, current_path, chunks):
        current_path = current_path or []
        chunks = chunks or [{}]
        if isinstance(data, dict):
            for key, value in data.items():
                new_path = current_path + [key]
                chunk_size = self._json_size(chunks[-1])
                size = self._json_size({key: value})
                remaining = self.max_chunk_size - chunk_size
                if size < remaining:
                    self._set_nested_dict(chunks[-1], new_path, value)
                else:
                    if chunk_size >= self.min_chunk_size:
                        chunks.append({})
                    self._json_split(value, new_path, chunks)
        else:
            self._set_nested_dict(chunks[-1], current_path, data)
        return chunks

    def split_json(self, json_data, convert_lists: bool = False) -> list[dict]:
        if convert_lists:
            chunks = self._json_split(
                self._list_to_dict_preprocessing(json_data), None, None)
        else:
            chunks = self._json_split(json_data, None, None)
        if chunks and not chunks[-1]:
            chunks.pop()
        return chunks
