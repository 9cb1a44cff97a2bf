package software.amazon.awssdk.services.dynamodb.model;

public enum KeyType { HASH, RANGE }
