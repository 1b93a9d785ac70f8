// Shim: interned-string block with flat serialization (mmseqs iface).
// Layout (serialize): [entryCount T][byteCapacity T][offsets T*count][bytes]
#ifndef SHIM_STRINGBLOCK_H
#define SHIM_STRINGBLOCK_H

#include <cstdlib>
#include <cstring>

template <typename T>
class StringBlock {
public:
    StringBlock(size_t byteCapacity_ = 32, size_t entryCapacity_ = 8) {
        byteCapacity = byteCapacity_;
        entryCapacity = entryCapacity_;
        data = (char *)malloc(byteCapacity);
        offsets = (T *)malloc(entryCapacity * sizeof(T));
        offsets[0] = 0;
        entryCount = 0;
        externalData = false;
    }

    explicit StringBlock(const StringBlock<T> *other) {
        byteCapacity = other->byteCapacity;
        entryCapacity = other->entryCapacity;
        entryCount = other->entryCount;
        data = (char *)malloc(byteCapacity);
        memcpy(data, other->data, byteCapacity);
        offsets = (T *)malloc(entryCapacity * sizeof(T));
        memcpy(offsets, other->offsets, entryCapacity * sizeof(T));
        externalData = false;
    }

    ~StringBlock() {
        if (!externalData) {
            free(data);
            free(offsets);
        }
    }

    const char *getString(T idx) const {
        if (idx >= entryCount) {
            return NULL;
        }
        return data + offsets[idx];
    }

    T append(const char *string, size_t length) {
        size_t nextSize = offsets[entryCount] + length + 1;
        if (nextSize > byteCapacity) {
            byteCapacity = nextSize * 2;
            data = (char *)realloc(data, byteCapacity);
        }
        memcpy(data + offsets[entryCount], string, length);
        data[offsets[entryCount] + length] = '\0';
        ++entryCount;
        if (entryCount >= entryCapacity) {
            entryCapacity = entryCapacity * 2;
            offsets = (T *)realloc(offsets, entryCapacity * sizeof(T));
        }
        offsets[entryCount] = offsets[entryCount - 1] + (T)(length + 1);
        return entryCount - 1;
    }

    void compact() {
        byteCapacity = offsets[entryCount];
        data = (char *)realloc(data, byteCapacity ? byteCapacity : 1);
        entryCapacity = entryCount + 1;
        offsets = (T *)realloc(offsets, entryCapacity * sizeof(T));
    }

    static size_t memorySize(const StringBlock<T> &block) {
        return 2 * sizeof(T) + (block.entryCount + 1) * sizeof(T)
            + block.offsets[block.entryCount];
    }

    static char *serialize(const StringBlock<T> &block) {
        char *mem = (char *)malloc(memorySize(block));
        char *p = mem;
        T cnt = block.entryCount;
        T bytes = block.offsets[block.entryCount];
        memcpy(p, &cnt, sizeof(T)); p += sizeof(T);
        memcpy(p, &bytes, sizeof(T)); p += sizeof(T);
        memcpy(p, block.offsets, (block.entryCount + 1) * sizeof(T));
        p += (block.entryCount + 1) * sizeof(T);
        memcpy(p, block.data, bytes);
        return mem;
    }

    static StringBlock<T> *unserialize(const char *mem) {
        const char *p = mem;
        T cnt, bytes;
        memcpy(&cnt, p, sizeof(T)); p += sizeof(T);
        memcpy(&bytes, p, sizeof(T)); p += sizeof(T);
        StringBlock<T> *block = (StringBlock<T> *)malloc(sizeof(StringBlock<T>));
        block->entryCount = cnt;
        block->entryCapacity = cnt + 1;
        block->byteCapacity = bytes;
        block->offsets = (T *)p;
        block->data = (char *)(p + (cnt + 1) * sizeof(T));
        block->externalData = true;
        return block;
    }

private:
    char *data;
    T *offsets;
    T entryCount;
    size_t byteCapacity;
    size_t entryCapacity;
    bool externalData;
};

#endif
